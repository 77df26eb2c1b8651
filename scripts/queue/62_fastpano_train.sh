#!/bin/bash
# r5 task 1 (VERDICT #1): train the TPU-fast baseline family (FastPanoNet)
# with the zoo recipe + distillation from the shipping corrupt-ft panoramic
# teacher (models/fastpano.py; teacher loss in models/train.py).
cd /root/repo
mkdir -p /tmp/fastpano
if [ ! -f /tmp/fastpano/fastpano_final.params.npz ]; then
  resume=""
  ls -d /tmp/fastpano/fastpano_[0-9]* >/dev/null 2>&1 && resume="--resume"
  timeout 5400 python -m panodepth.train_cli fastpano x x /tmp/fastpano \
      --synth --synth-version mix --steps 14000 --batch-size 16 --lr 3e-4 \
      --pano-width 512 --distill-from zoo/panoramic_final.params.npz $resume \
      --ckpt-every 2000 --log-every 1000 > /tmp/q/out/fastpano_train.log 2>&1
  tail -3 /tmp/q/out/fastpano_train.log
  [ -f /tmp/fastpano/fastpano_final.params.npz ] || exit 1
fi
mkdir -p zoo/candidates/fastpano
cp /tmp/fastpano/fastpano_final.params.npz zoo/candidates/fastpano/
cp /tmp/fastpano/fastpano.config.json zoo/candidates/fastpano/
out=/tmp/q/out/fastpano_eval.jsonl
touch "$out"
rc=0
for sc in v1 v2; do
  grep -q "\"scenes\": \"$sc\"" "$out" && { echo "skip $sc"; continue; }
  timeout 1200 python -m panodepth.models.evaluate \
      zoo/candidates/fastpano/fastpano_final.params.npz \
      --scenes $sc >> "$out" 2>/dev/null || rc=1
done
cat "$out"
exit $rc
