#!/bin/bash
# Panoramic-baseline corrupt fine-tune (VERDICT r3 #3's second family):
# mild recipe (prob 0.5) + 4-cell evals + CLI proof gate with the new
# baseline under both clean and corrupted evalsets.
cd /root/repo
mkdir -p /tmp/ft_pano
if [ ! -f /tmp/ft_pano/panoramic_final.params.npz ]; then
  resume=""
  ls -d /tmp/ft_pano/panoramic_[0-9]* >/dev/null 2>&1 && resume="--resume"
  timeout 2400 python -m panodepth.train_cli panoramic x x /tmp/ft_pano \
      --synth --synth-version mix --steps 6000 --batch-size 16 --lr 1e-4 \
      --pano-width 512 --corrupt --corrupt-prob 0.5 $resume \
      --init-from zoo/panoramic_final.params.npz \
      --ckpt-every 2000 --log-every 1000 > /tmp/q/out/pano_ft_train.log 2>&1
  tail -2 /tmp/q/out/pano_ft_train.log
  [ -f /tmp/ft_pano/panoramic_final.params.npz ] || exit 1
fi
mkdir -p zoo/candidates/pano_ft
cp /tmp/ft_pano/panoramic_final.params.npz zoo/candidates/pano_ft/
cp /tmp/ft_pano/panoramic.config.json zoo/candidates/pano_ft/
out=/tmp/q/out/pano_ft_eval.jsonl
touch "$out"
rc=0
for ck in zoo/panoramic_final.params.npz zoo/candidates/pano_ft/panoramic_final.params.npz; do
  for sc in v1 v2; do
    for c in "" "--corrupt"; do
      cf=false; [ -n "$c" ] && cf=true
      python - "$ck" "$sc" "$cf" <<'PY' && { echo "skip $ck $sc $c"; continue; }
import json, sys
ck, sc, co = sys.argv[1], sys.argv[2], sys.argv[3] == "true"
for line in open('/tmp/q/out/pano_ft_eval.jsonl'):
    try: r = json.loads(line)
    except ValueError: continue
    if r.get('ckpt','').endswith(ck) and r.get('scenes')==sc and r.get('corrupt')==co:
        sys.exit(0)
sys.exit(1)
PY
      timeout 1200 python -m panodepth.models.evaluate "$ck" --scenes $sc $c >> "$out" 2>/dev/null || rc=1
    done
  done
done
cat "$out"
exit $rc
