#!/bin/bash
# Student-perspective promotion gate: 24-scene proof (clean + corrupted)
# with the 0.75-width NF student + shipping fastpano baseline.  Control =
# docs/logs_r5/fastpano_proof.txt (full-width NF-ft + fastpano, same
# scenes).
cd /root/repo
ck=zoo/candidates/persp_student/perspective_final.params.npz
[ -f "$ck" ] || { echo "student ckpt missing"; exit 1; }
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_ps_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
        --persp-ckpt "$ck" --baseline-ckpt zoo/fastpano_final.params.npz \
        --batch-size 2 || fail=1
  fi
  out=/tmp/proof_pscorr_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets_corrupt/$sc/rgb /tmp/proofsets_corrupt/$sc/gt x "$out" \
        --persp-ckpt "$ck" --baseline-ckpt zoo/fastpano_final.params.npz \
        --batch-size 2 || fail=1
  fi
done
python scripts/proof_report.py /tmp/proof_ps_v1 /tmp/proof_ps_v2 \
    /tmp/proof_pscorr_v1 /tmp/proof_pscorr_v2 > /tmp/q/out/persp_s_proof.txt 2>&1 || fail=1
cat /tmp/q/out/persp_s_proof.txt
exit $fail
