#!/bin/bash
# Half-res baseline CNN experiment: throughput A/B + 12-scene accuracy proof.
cd /root/repo
fail=0
BENCH_E2E_BASEW=256 timeout 900 python scripts/e2e_ab.py \
    zoo/perspective_final.params.npz zoo/panoramic_final.params.npz \
    > /tmp/q/out/base256_e2e.json 2>/dev/null || fail=1
cat /tmp/q/out/base256_e2e.json
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
for sc in v1 v2; do
  out=/tmp/proof_base256_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -eq 6 ]; then echo "skip base256 $sc (complete)"; continue; fi
  rm -rf "$out"
  timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
      --persp-ckpt zoo/perspective_final.params.npz \
      --baseline-ckpt zoo/panoramic_final.params.npz --batch-size 2 \
      --base-width 256 || fail=1
done
python scripts/proof_report.py /tmp/proof_base256_v1 /tmp/proof_base256_v2 \
    > /tmp/q/out/base256_proof.txt 2>&1 || fail=1
cat /tmp/q/out/base256_proof.txt
exit $fail
