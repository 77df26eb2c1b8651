#!/bin/bash
cd /root/repo
rc=0
# full-net A/B at the e2e fan-out batch (120 images = 8 panos x 15 views)
timeout 900 python scripts/pano_bench.py zoo/perspective_final.params.npz 120 >> /tmp/q/out/int8_net.jsonl 2>/dev/null || rc=1
timeout 900 python scripts/pano_bench.py zoo/perspective_final.params.npz 120 --int8 >> /tmp/q/out/int8_net.jsonl 2>/dev/null || rc=1
cat /tmp/q/out/int8_net.jsonl
exit $rc
