#!/bin/bash
cd /root/repo
out=/tmp/q/out/int8_eval.jsonl
touch "$out"
rc=0
for sc in v1 v2; do
  if grep -q "\"scenes\": \"$sc\"" "$out" 2>/dev/null; then echo "skip $sc"; continue; fi
  timeout 1500 python -m panodepth.models.evaluate zoo/perspective_final.params.npz \
      --scenes $sc --int8 >> "$out" 2>/dev/null || rc=1
done
cat "$out"
exit $rc
