#!/bin/bash
# Minimal fresh primary capture: only the 2048 fused section (fits a short
# tunnel-heal window). The full bench job (05) still runs after.
cd /root/repo
BENCH_SECTIONS=2048 BENCH_PREFLIGHT_BUDGET_S=180 BENCH_INPROC_PREFLIGHT_S=300 \
  timeout 1200 python bench.py > /tmp/q/out/bench_primary.json 2>/dev/null
cat /tmp/q/out/bench_primary.json
python - <<'PY'
import json, sys
fresh = False
for line in open('/tmp/q/out/bench_primary.json'):
    try: r = json.loads(line)
    except ValueError: continue
    if r.get('metric') == 'panoramas_per_sec_2048x1024_fused' and 'stale_s' not in r:
        fresh = True
sys.exit(0 if fresh else 1)
PY
