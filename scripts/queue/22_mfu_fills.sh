#!/bin/bash
cd /root/repo
rc=0
for ck in bifuse slicenet; do
  timeout 700 python scripts/pano_bench.py zoo/${ck}_final.params.npz 8 >> /tmp/q/out/mfu_fills.jsonl 2>/dev/null || rc=1
done
cat /tmp/q/out/mfu_fills.jsonl
exit $rc
