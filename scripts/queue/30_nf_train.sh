#!/bin/bash
# NF-perspective training with the zoo recipe (VERDICT r3 next-step #6).
cd /root/repo
mkdir -p /tmp/nf_persp
timeout 5400 python -m panodepth.train_cli perspective x x /tmp/nf_persp \
    --synth --synth-version mix --steps 18000 --batch-size 16 --lr 3e-4 \
    --variant nf --ckpt-every 6000 --log-every 1000 \
    > /tmp/q/out/nf_train.log 2>&1
rc=$?
tail -5 /tmp/q/out/nf_train.log
[ -f /tmp/nf_persp/perspective_final.params.npz ] || exit 1
mkdir -p zoo/candidates/nf && cp /tmp/nf_persp/perspective_final.params.npz zoo/candidates/nf/perspective_final.params.npz
cp /tmp/nf_persp/perspective.config.json zoo/candidates/nf/perspective.config.json
for sc in v1 v2; do
  timeout 1500 python -m panodepth.models.evaluate zoo/candidates/nf/perspective_final.params.npz \
      --scenes $sc >> /tmp/q/out/nf_eval.jsonl 2>/dev/null || rc=1
done
cat /tmp/q/out/nf_eval.jsonl
exit $rc
