#!/bin/bash
# Clean 12-scene CLI proof with the corrupt_ft weights (ship-decision gate:
# the clean proof must stay 12/12 if corrupt_ft is promoted).
cd /root/repo
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_ftclean_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -eq 6 ]; then echo "skip ftclean $sc (complete)"; continue; fi
  rm -rf "$out"
  echo "--- ft clean proof $sc"
  timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
      --persp-ckpt zoo/candidates/corrupt_ft/perspective_final.params.npz \
      --baseline-ckpt zoo/panoramic_final.params.npz --batch-size 2 || fail=1
done
python scripts/proof_report.py /tmp/proof_ftclean_v1 /tmp/proof_ftclean_v2 \
    > /tmp/q/out/ft_clean_proof.txt 2>&1 || fail=1
cat /tmp/q/out/ft_clean_proof.txt
exit $fail
