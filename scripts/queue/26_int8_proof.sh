#!/bin/bash
# int8 perspective CNN 12-scene CLI accuracy proof. Resumable per folder.
cd /root/repo
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_int8_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -eq 6 ]; then echo "skip $sc int8 (complete)"; continue; fi
  rm -rf "$out"
  echo "--- proof $sc int8"
  timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
      --persp-ckpt zoo/perspective_final.params.npz \
      --baseline-ckpt zoo/panoramic_final.params.npz --batch-size 2 \
      --persp-int8 || fail=1
done
python scripts/proof_report.py /tmp/proof_int8_v1 /tmp/proof_int8_v2 \
    > /tmp/q/out/int8_proof.txt 2>&1 || fail=1
cat /tmp/q/out/int8_proof.txt
exit $fail
