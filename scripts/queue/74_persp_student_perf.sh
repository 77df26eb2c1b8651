#!/bin/bash
# Student-perspective perf: MFU row + e2e ladder with the student at the
# combined config (fastpano baseline, box feed, packed vs pair16).
cd /root/repo
ck=zoo/candidates/persp_student/perspective_final.params.npz
[ -f "$ck" ] || { echo "student ckpt missing"; exit 1; }
out=/tmp/q/out/persp_s_perf.jsonl
touch "$out"
rc=0
run() {
  local tag=$1; shift
  grep -q "\"tag\": \"$tag\"" "$out" 2>/dev/null && { echo "skip $tag"; return 0; }
  if env "$@" > /tmp/q/out/_ps_tmp.json 2>&1; then
    python - "$tag" < /tmp/q/out/_ps_tmp.json >> "$out" <<'PY'
import json, sys
lines = [l for l in sys.stdin.read().splitlines() if l.strip().startswith('{')]
rec = json.loads(lines[-1]) if lines else {}
rec['tag'] = sys.argv[1]
print(json.dumps(rec))
PY
  else
    tail -3 /tmp/q/out/_ps_tmp.json; return 1
  fi
}
run student_mfu_b120 timeout 1200 python scripts/pano_bench.py "$ck" 120 || rc=1
run student_e2e timeout 2400 python scripts/e2e_ab.py "$ck" zoo/fastpano_final.params.npz || rc=1
run student_e2e_box PANODEPTH_BASE_FEED=box timeout 2400 python scripts/e2e_ab.py "$ck" zoo/fastpano_final.params.npz || rc=1
run student_e2e_box_pair16 PANODEPTH_BASE_FEED=box BENCH_E2E_EXTRACT=pair16 timeout 2400 python scripts/e2e_ab.py "$ck" zoo/fastpano_final.params.npz || rc=1
cat "$out"
exit $rc
