#!/bin/bash
# FastPanoNet mild corrupt fine-tune (the proven prob-0.5 recipe) + 4-cell
# clean/corrupt evals of the candidate.
cd /root/repo
[ -f zoo/candidates/fastpano/fastpano_final.params.npz ] || { echo "train first"; exit 1; }
mkdir -p /tmp/fastpano_ft
if [ ! -f /tmp/fastpano_ft/fastpano_final.params.npz ]; then
  resume=""
  ls -d /tmp/fastpano_ft/fastpano_[0-9]* >/dev/null 2>&1 && resume="--resume"
  timeout 3600 python -m panodepth.train_cli fastpano x x /tmp/fastpano_ft \
      --synth --synth-version mix --steps 6000 --batch-size 16 --lr 1e-4 \
      --pano-width 512 --corrupt --corrupt-prob 0.5 $resume \
      --init-from zoo/candidates/fastpano/fastpano_final.params.npz \
      --ckpt-every 2000 --log-every 1000 > /tmp/q/out/fastpano_ft_train.log 2>&1
  tail -2 /tmp/q/out/fastpano_ft_train.log
  [ -f /tmp/fastpano_ft/fastpano_final.params.npz ] || exit 1
fi
mkdir -p zoo/candidates/fastpano_ft
cp /tmp/fastpano_ft/fastpano_final.params.npz zoo/candidates/fastpano_ft/
cp /tmp/fastpano_ft/fastpano.config.json zoo/candidates/fastpano_ft/
out=/tmp/q/out/fastpano_ft_eval.jsonl
touch "$out"
rc=0
for sc in v1 v2; do
  for c in "" "--corrupt"; do
    cf=false; [ -n "$c" ] && cf=true
    python - "$sc" "$cf" <<'PY' && { echo "skip $sc $c"; continue; }
import json, sys
sc, co = sys.argv[1], sys.argv[2] == "true"
for line in open('/tmp/q/out/fastpano_ft_eval.jsonl'):
    try: r = json.loads(line)
    except ValueError: continue
    if r.get('scenes') == sc and r.get('corrupt') == co:
        sys.exit(0)
sys.exit(1)
PY
    timeout 1200 python -m panodepth.models.evaluate \
        zoo/candidates/fastpano_ft/fastpano_final.params.npz \
        --scenes $sc $c >> "$out" 2>/dev/null || rc=1
  done
done
cat "$out"
exit $rc
