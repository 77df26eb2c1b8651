#!/bin/bash
# Full bench capture: seeds BENCH_LEDGER.jsonl with fresh on-chip numbers.
cd /root/repo
BENCH_PREFLIGHT_BUDGET_S=240 timeout 2700 python bench.py > /tmp/q/out/bench_capture.json 2>/tmp/q/out/bench_capture.err
rc=$?
cat /tmp/q/out/bench_capture.json
# success = a fresh (non-stale) primary line was captured
python - <<'PY'
import json, sys
fresh = False
for line in open('/tmp/q/out/bench_capture.json'):
    try: r = json.loads(line)
    except ValueError: continue
    if r.get('metric') == 'panoramas_per_sec_2048x1024_fused' and 'stale_s' not in r:
        fresh = True
sys.exit(0 if fresh else 1)
PY
