#!/bin/bash
# Belt-and-suspenders for the pair16 default flip: the 12-scene clean
# proof under the FULL shipping configuration (NF-ft perspective +
# fastpano baseline + pair16).  Control = docs/logs_r5/fastpano_proof.txt
# clean cells (same pair, packed).
cd /root/repo
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_p16fp_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
        --persp-ckpt zoo/perspective_final.params.npz \
        --baseline-ckpt zoo/fastpano_final.params.npz \
        --extract-dtype pair16 --batch-size 2 || fail=1
  fi
done
python scripts/proof_report.py /tmp/proof_p16fp_v1 /tmp/proof_p16fp_v2 \
    > /tmp/q/out/pair16_fp_proof.txt 2>&1 || fail=1
cat /tmp/q/out/pair16_fp_proof.txt
exit $fail
