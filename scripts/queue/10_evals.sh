#!/bin/bash
# Missing robustness cells; resumable — skips cells already in the output.
cd /root/repo
out=/tmp/q/out/robustness.jsonl
touch "$out"
fail=0
have () { # ckpt scenes corrupt(true|false)
  python - "$1" "$2" "$3" <<'PY'
import json, sys
ck, sc, co = sys.argv[1], sys.argv[2], sys.argv[3] == "true"
for line in open('/tmp/q/out/robustness.jsonl'):
    try: r = json.loads(line)
    except ValueError: continue
    if r.get('ckpt','').endswith(ck) and r.get('scenes')==sc and r.get('corrupt')==co:
        sys.exit(0)
sys.exit(1)
PY
}
run_eval () { # ckpt scenes corruptflag
  cflag=false; [ -n "$3" ] && cflag=true
  if have "$1" "$2" "$cflag"; then echo "skip $1 $2 $3"; return; fi
  echo "eval $1 $2 $3" >&2
  timeout 1500 python -m panodepth.models.evaluate "$1" --scenes "$2" $3 >> "$out" 2>/dev/null || fail=1
}
run_eval zoo/perspective_final.params.npz v2 --corrupt
run_eval zoo/candidates/corrupt_ft/perspective_final.params.npz v1 ""
run_eval zoo/candidates/corrupt_ft/perspective_final.params.npz v1 --corrupt
run_eval zoo/candidates/corrupt_ft/perspective_final.params.npz v2 ""
cat "$out"
exit $fail
