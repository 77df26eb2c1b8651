#!/bin/bash
# Dithered pair16 adjudication: 12-scene proof + same-conditions e2e timing.
cd /root/repo
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_pair16d_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -eq 6 ]; then echo "skip $sc pair16d (complete)"; continue; fi
  rm -rf "$out"
  echo "--- proof $sc pair16d"
  timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
      --persp-ckpt zoo/perspective_final.params.npz \
      --baseline-ckpt zoo/panoramic_final.params.npz --batch-size 2 \
      --extract-dtype pair16d || fail=1
done
python scripts/proof_report.py /tmp/proof_pair16d_v1 /tmp/proof_pair16d_v2 \
    > /tmp/q/out/pair16d_proof.txt 2>&1 || fail=1
cat /tmp/q/out/pair16d_proof.txt
BENCH_E2E_EXTRACT=pair16d timeout 900 python scripts/e2e_ab.py \
    zoo/perspective_final.params.npz zoo/panoramic_final.params.npz \
    > /tmp/q/out/pair16d_e2e.json 2>/dev/null || fail=1
cat /tmp/q/out/pair16d_e2e.json
exit $fail
