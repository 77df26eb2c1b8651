#!/bin/bash
# NF-perspective 12-scene CLI proof (promotion gate alongside its evals).
cd /root/repo
[ -f zoo/candidates/nf/perspective_final.params.npz ] || { echo "nf ckpt missing"; exit 1; }
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_nf_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -eq 6 ]; then echo "skip nf $sc (complete)"; continue; fi
  rm -rf "$out"
  timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
      --persp-ckpt zoo/candidates/nf/perspective_final.params.npz \
      --baseline-ckpt zoo/panoramic_final.params.npz --batch-size 2 || fail=1
done
python scripts/proof_report.py /tmp/proof_nf_v1 /tmp/proof_nf_v2 \
    > /tmp/q/out/nf_proof.txt 2>&1 || fail=1
cat /tmp/q/out/nf_proof.txt
exit $fail
