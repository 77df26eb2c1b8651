#!/bin/bash
# FastPanoNet promotion gate: 24-scene CLI proof (clean + corrupted) with
# the corrupt-ft fastpano as the e2e baseline under the shipping
# perspective weights.  Compared at harvest vs docs/logs_r4/pano_proof.txt
# (the shipping panoramic baseline on the same scene sets).
cd /root/repo
ck=zoo/candidates/fastpano_ft/fastpano_final.params.npz
[ -f "$ck" ] || { echo "fastpano_ft ckpt missing"; exit 1; }
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_fp_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
        --persp-ckpt zoo/perspective_final.params.npz --baseline-ckpt "$ck" \
        --batch-size 2 || fail=1
  fi
  out=/tmp/proof_fpcorr_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets_corrupt/$sc/rgb /tmp/proofsets_corrupt/$sc/gt x "$out" \
        --persp-ckpt zoo/perspective_final.params.npz --baseline-ckpt "$ck" \
        --batch-size 2 || fail=1
  fi
done
python scripts/proof_report.py /tmp/proof_fp_v1 /tmp/proof_fp_v2 \
    /tmp/proof_fpcorr_v1 /tmp/proof_fpcorr_v2 > /tmp/q/out/fastpano_proof.txt 2>&1 || fail=1
cat /tmp/q/out/fastpano_proof.txt
exit $fail
