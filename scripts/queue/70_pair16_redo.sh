#!/bin/bash
# pair16 re-adjudication under the NEW shipping perspective (NF corrupt-ft):
# r4's rejection hinged on one noise-sensitive scene (synth_0004 v1) under
# the old GN weights; the corrupt-hardened NF-ft net may absorb the RGB565
# quantization, and pair16 is worth +11.5 % e2e.  Control = the packed
# proof already in docs/logs_r5/nf_ft_proof.txt (same weights, same scenes).
cd /root/repo
[ -e /tmp/proofsets/done ] || { echo "proofsets not ready"; exit 1; }
fail=0
for sc in v1 v2; do
  out=/tmp/proof_p16nf_${sc}
  n=$(ls "$out"/*.aligned.txt 2>/dev/null | wc -l)
  if [ "$n" -ne 6 ]; then
    rm -rf "$out"
    timeout 1500 python -m panodepth 0 /tmp/proofsets/$sc/rgb /tmp/proofsets/$sc/gt x "$out" \
        --persp-ckpt zoo/perspective_final.params.npz \
        --baseline-ckpt zoo/panoramic_final.params.npz \
        --extract-dtype pair16 --batch-size 2 || fail=1
  fi
done
python scripts/proof_report.py /tmp/proof_p16nf_v1 /tmp/proof_p16nf_v2 \
    > /tmp/q/out/pair16_nf_proof.txt 2>&1 || fail=1
cat /tmp/q/out/pair16_nf_proof.txt
exit $fail
