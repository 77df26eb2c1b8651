#!/bin/bash
# FastPanoNet on-chip perf: MFU row (pano_bench b24) + same-conditions e2e
# A/B at 2048 b24 — shipping panoramic baseline vs the fastpano candidate.
cd /root/repo
ck=zoo/candidates/fastpano_ft/fastpano_final.params.npz
[ -f "$ck" ] || ck=zoo/candidates/fastpano/fastpano_final.params.npz
[ -f "$ck" ] || { echo "fastpano ckpt missing"; exit 1; }
rc=0
timeout 1200 python scripts/pano_bench.py "$ck" 24 \
    > /tmp/q/out/fastpano_mfu.json 2>&1 || rc=1
cat /tmp/q/out/fastpano_mfu.json
timeout 2400 python scripts/e2e_ab.py \
    zoo/perspective_final.params.npz zoo/panoramic_final.params.npz \
    zoo/perspective_final.params.npz "$ck" \
    > /tmp/q/out/fastpano_e2e_ab.json 2>&1 || rc=1
cat /tmp/q/out/fastpano_e2e_ab.json
exit $rc
