#!/bin/bash
# e2e throughput with the int8 perspective CNN: packed and pair16 extraction
cd /root/repo
rc=0
BENCH_E2E_INT8=1 timeout 1200 python scripts/e2e_ab.py zoo/perspective_final.params.npz \
    zoo/panoramic_final.params.npz >> /tmp/q/out/int8_e2e.jsonl 2>/dev/null || rc=1
BENCH_E2E_INT8=1 BENCH_E2E_EXTRACT=pair16 timeout 900 python scripts/e2e_ab.py \
    zoo/perspective_final.params.npz zoo/panoramic_final.params.npz \
    >> /tmp/q/out/int8_e2e.jsonl 2>/dev/null || rc=1
cat /tmp/q/out/int8_e2e.jsonl
exit $rc
