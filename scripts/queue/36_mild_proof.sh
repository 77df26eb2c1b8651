#!/bin/bash
# corrupt_ft_mild promotion gate: clean + corrupted 12-scene CLI proofs.
cd /root/repo
ck=zoo/candidates/corrupt_ft_mild/perspective_final.params.npz
[ -f "$ck" ] || { echo "mild ckpt missing"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_mildclean_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
        --persp-ckpt "$ck" --baseline-ckpt zoo/panoramic_final.params.npz \
        --batch-size 2 || fail=1
  fi
  out=/tmp/proof_mildcorr_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets_corrupt/$sc/rgb /tmp/proofsets_corrupt/$sc/gt x "$out" \
        --persp-ckpt "$ck" --baseline-ckpt zoo/panoramic_final.params.npz \
        --batch-size 2 || fail=1
  fi
done
python scripts/proof_report.py /tmp/proof_mildclean_v1 /tmp/proof_mildclean_v2 \
    /tmp/proof_mildcorr_v1 /tmp/proof_mildcorr_v2 > /tmp/q/out/mild_proof.txt 2>&1 || fail=1
cat /tmp/q/out/mild_proof.txt
exit $fail
