#!/bin/bash
# Distilled perspective student (NF variant, width_scale 0.75 — 56 % of
# the FLOPs): the biggest remaining e2e lever (the perspective CNN is
# 5.2 ms of the 13.6 ms/pano).  Zoo recipe + distillation from the
# shipping NF-ft teacher, then the mild corrupt-ft, then 4-cell evals.
cd /root/repo
mkdir -p /tmp/persp_s
if [ ! -f /tmp/persp_s/perspective_final.params.npz ]; then
  resume=""
  ls -d /tmp/persp_s/perspective_[0-9]* >/dev/null 2>&1 && resume="--resume"
  timeout 3600 python -m panodepth.train_cli perspective x x /tmp/persp_s \
      --synth --synth-version mix --steps 14000 --batch-size 16 --lr 3e-4 \
      --variant nf --width-scale 0.75 $resume \
      --distill-from zoo/perspective_final.params.npz \
      --ckpt-every 4000 --log-every 2000 > /tmp/q/out/persp_s_train.log 2>&1
  tail -2 /tmp/q/out/persp_s_train.log
  [ -f /tmp/persp_s/perspective_final.params.npz ] || exit 1
fi
mkdir -p /tmp/persp_sft
if [ ! -f /tmp/persp_sft/perspective_final.params.npz ]; then
  resume=""
  ls -d /tmp/persp_sft/perspective_[0-9]* >/dev/null 2>&1 && resume="--resume"
  timeout 2400 python -m panodepth.train_cli perspective x x /tmp/persp_sft \
      --synth --synth-version mix --steps 6000 --batch-size 16 --lr 1e-4 \
      --variant nf --width-scale 0.75 --corrupt --corrupt-prob 0.5 $resume \
      --init-from /tmp/persp_s/perspective_final.params.npz \
      --ckpt-every 3000 --log-every 2000 > /tmp/q/out/persp_sft_train.log 2>&1
  tail -2 /tmp/q/out/persp_sft_train.log
  [ -f /tmp/persp_sft/perspective_final.params.npz ] || exit 1
fi
mkdir -p zoo/candidates/persp_student
cp /tmp/persp_sft/perspective_final.params.npz zoo/candidates/persp_student/
cp /tmp/persp_sft/perspective.config.json zoo/candidates/persp_student/
out=/tmp/q/out/persp_s_eval.jsonl
touch "$out"
rc=0
for sc in v1 v2; do
  for c in "" "--corrupt"; do
    cf=false; [ -n "$c" ] && cf=true
    python - "$sc" "$cf" <<'PY' && { echo "skip $sc $c"; continue; }
import json, sys
sc, co = sys.argv[1], sys.argv[2] == "true"
for line in open('/tmp/q/out/persp_s_eval.jsonl'):
    try: r = json.loads(line)
    except ValueError: continue
    if r.get('scenes') == sc and r.get('corrupt') == co:
        sys.exit(0)
sys.exit(1)
PY
    timeout 1200 python -m panodepth.models.evaluate \
        zoo/candidates/persp_student/perspective_final.params.npz \
        --scenes $sc $c >> "$out" 2>/dev/null || rc=1
  done
done
cat "$out"
exit $rc
