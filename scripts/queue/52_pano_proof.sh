#!/bin/bash
# Promotion gate for the corrupt-ft panoramic baseline: clean + corrupted
# proofs with the NEW baseline under the shipping perspective weights.
cd /root/repo
ck=zoo/candidates/pano_ft/panoramic_final.params.npz
[ -f "$ck" ] || { echo "pano ft ckpt missing"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_panoft_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
        --persp-ckpt zoo/perspective_final.params.npz --baseline-ckpt "$ck" \
        --batch-size 2 || fail=1
  fi
  out=/tmp/proof_panoftcorr_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets_corrupt/$sc/rgb /tmp/proofsets_corrupt/$sc/gt x "$out" \
        --persp-ckpt zoo/perspective_final.params.npz --baseline-ckpt "$ck" \
        --batch-size 2 || fail=1
  fi
done
python scripts/proof_report.py /tmp/proof_panoft_v1 /tmp/proof_panoft_v2 \
    /tmp/proof_panoftcorr_v1 /tmp/proof_panoftcorr_v2 > /tmp/q/out/pano_proof.txt 2>&1 || fail=1
cat /tmp/q/out/pano_proof.txt
exit $fail
