#!/bin/bash
# Corrupted-input 12-scene CLI proof: ship vs corrupt_ft weights on the
# JPEG-q40+noise evalset (the 4-cell robustness table's e2e complement).
cd /root/repo
[ -e /tmp/proofsets_corrupt/done ] || { echo "corrupt proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  for w in ship ft; do
    ck=zoo/perspective_final.params.npz
    [ "$w" = ft ] && ck=zoo/candidates/corrupt_ft/perspective_final.params.npz
    out=/tmp/proof_corrupt_${w}_${sc}
    n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
    if [ "$n" -eq 6 ]; then echo "skip $w $sc (complete)"; continue; fi
    rm -rf "$out"
    echo "--- corrupt proof $w $sc"
    timeout 1500 python -m panodepth 0 /tmp/proofsets_corrupt/$sc/rgb /tmp/proofsets_corrupt/$sc/gt x "$out" \
        --persp-ckpt "$ck" \
        --baseline-ckpt zoo/panoramic_final.params.npz --batch-size 2 || fail=1
  done
done
python scripts/proof_report.py /tmp/proof_corrupt_ship_v1 /tmp/proof_corrupt_ft_v1 \
    /tmp/proof_corrupt_ship_v2 /tmp/proof_corrupt_ft_v2 \
    > /tmp/q/out/corrupt_proof.txt 2>&1 || fail=1
cat /tmp/q/out/corrupt_proof.txt
exit $fail
