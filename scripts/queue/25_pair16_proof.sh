#!/bin/bash
# pair16 vs packed 12-scene held-out CLI A/B (VERDICT r3 next-step #2).
# Resumable: a proof folder with 6 .aligned.txt files is complete.
cd /root/repo
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  for ed in packed pair16; do
    out=/tmp/proof_${ed}_${sc}
    n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
    if [ "$n" -eq 6 ]; then echo "skip $sc $ed (complete)"; continue; fi
    rm -rf "$out"
    echo "--- proof $sc $ed"
    timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
        --persp-ckpt zoo/perspective_final.params.npz \
        --baseline-ckpt zoo/panoramic_final.params.npz --batch-size 2 \
        --extract-dtype $ed || fail=1
  done
done
python scripts/proof_report.py /tmp/proof_packed_v1 /tmp/proof_pair16_v1 /tmp/proof_packed_v2 /tmp/proof_pair16_v2 \
    > /tmp/q/out/pair16_proof.txt 2>&1 || fail=1
cat /tmp/q/out/pair16_proof.txt
exit $fail
