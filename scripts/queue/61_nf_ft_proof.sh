#!/bin/bash
# NF-ft adjudication gate: 24-scene CLI proof (clean + corrupted evalsets)
# with the NF corrupt-ft perspective under the shipping panoramic baseline.
# Compared at harvest against docs/logs_r4/mild_proof.txt (the shipping
# GN-ft weights on the same scene sets).
cd /root/repo
ck=zoo/candidates/nf_ft/perspective_final.params.npz
[ -f "$ck" ] || { echo "nf_ft ckpt missing"; exit 1; }
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_nfft_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
        --persp-ckpt "$ck" --baseline-ckpt zoo/panoramic_final.params.npz \
        --batch-size 2 || fail=1
  fi
  out=/tmp/proof_nfftcorr_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets_corrupt/$sc/rgb /tmp/proofsets_corrupt/$sc/gt x "$out" \
        --persp-ckpt "$ck" --baseline-ckpt zoo/panoramic_final.params.npz \
        --batch-size 2 || fail=1
  fi
done
python scripts/proof_report.py /tmp/proof_nfft_v1 /tmp/proof_nfft_v2 \
    /tmp/proof_nfftcorr_v1 /tmp/proof_nfftcorr_v2 > /tmp/q/out/nf_ft_proof.txt 2>&1 || fail=1
cat /tmp/q/out/nf_ft_proof.txt
exit $fail
