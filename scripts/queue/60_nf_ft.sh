#!/bin/bash
# r5 task 4 (VERDICT #4): apply the proven mild corrupt-prob-0.5 fine-tune
# to the NF-perspective weights, then the 4-cell clean/corrupt eval of the
# candidate (the GN comparison cells live in docs/logs_r4/).
cd /root/repo
mkdir -p /tmp/nf_ft
if [ ! -f /tmp/nf_ft/perspective_final.params.npz ]; then
  resume=""
  ls -d /tmp/nf_ft/perspective_[0-9]* >/dev/null 2>&1 && resume="--resume"
  timeout 2400 python -m panodepth.train_cli perspective x x /tmp/nf_ft \
      --synth --synth-version mix --steps 6000 --batch-size 16 --lr 1e-4 \
      --variant nf --corrupt --corrupt-prob 0.5 $resume \
      --init-from zoo/nf/perspective_final.params.npz \
      --ckpt-every 2000 --log-every 1000 > /tmp/q/out/nf_ft_train.log 2>&1
  tail -2 /tmp/q/out/nf_ft_train.log
  [ -f /tmp/nf_ft/perspective_final.params.npz ] || exit 1
fi
mkdir -p zoo/candidates/nf_ft
cp /tmp/nf_ft/perspective_final.params.npz zoo/candidates/nf_ft/
cp /tmp/nf_ft/perspective.config.json zoo/candidates/nf_ft/
out=/tmp/q/out/nf_ft_eval.jsonl
touch "$out"
rc=0
for sc in v1 v2; do
  for c in "" "--corrupt"; do
    cf=false; [ -n "$c" ] && cf=true
    python - "$sc" "$cf" <<'PY' && { echo "skip $sc $c"; continue; }
import json, sys
sc, co = sys.argv[1], sys.argv[2] == "true"
for line in open('/tmp/q/out/nf_ft_eval.jsonl'):
    try: r = json.loads(line)
    except ValueError: continue
    if r.get('scenes') == sc and r.get('corrupt') == co:
        sys.exit(0)
sys.exit(1)
PY
    timeout 1200 python -m panodepth.models.evaluate \
        zoo/candidates/nf_ft/perspective_final.params.npz \
        --scenes $sc $c >> "$out" 2>/dev/null || rc=1
  done
done
cat "$out"
exit $rc
