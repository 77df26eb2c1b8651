#!/bin/bash
# Milder corrupt fine-tune (corrupt-prob 0.5): aims to keep the corrupted-
# gap win without the 4.3% clean-v1 regression of the full-strength ft.
cd /root/repo
mkdir -p /tmp/ft_mild
if [ ! -f /tmp/ft_mild/perspective_final.params.npz ]; then
  timeout 2400 python -m panodepth.train_cli perspective x x /tmp/ft_mild \
      --synth --synth-version mix --steps 6000 --batch-size 16 --lr 1e-4 \
      --corrupt --corrupt-prob 0.5 --init-from zoo/perspective_final.params.npz \
      --ckpt-every 3000 --log-every 1000 > /tmp/q/out/ft_mild_train.log 2>&1 || exit 1
fi
mkdir -p zoo/candidates/corrupt_ft_mild
cp /tmp/ft_mild/perspective_final.params.npz zoo/candidates/corrupt_ft_mild/
cp /tmp/ft_mild/perspective.config.json zoo/candidates/corrupt_ft_mild/
out=/tmp/q/out/ft_mild_eval.jsonl
touch "$out"
rc=0
for sc in v1 v2; do
  for c in "" "--corrupt"; do
    key="$sc$c"
    grep -q "\"scenes\": \"$sc\", \"corrupt\": $( [ -n "$c" ] && echo true || echo false )" "$out" && { echo "skip $key"; continue; }
    timeout 1500 python -m panodepth.models.evaluate \
        zoo/candidates/corrupt_ft_mild/perspective_final.params.npz \
        --scenes $sc $c >> "$out" 2>/dev/null || rc=1
  done
done
cat "$out"
exit $rc
