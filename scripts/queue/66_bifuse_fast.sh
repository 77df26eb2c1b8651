#!/bin/bash
# r5 task 3 (VERDICT #3): make BiFuse/SliceNet TPU-real.  On-chip A/B of
# the fast-projection BiFuse graph (same checkpoint, nearest-tap feature
# gathers + half-res final projection) vs the shipping bilinear graph,
# the SliceNet unrolled-GRU re-measure, and the held-out evals of the
# fast graphs.
cd /root/repo
rc=0
out=/tmp/q/out/bifuse_fast.jsonl
touch "$out"
run() {  # run <tag> <cmd...> — skip if tag already recorded
  local tag=$1; shift
  grep -q "\"tag\": \"$tag\"" "$out" 2>/dev/null && { echo "skip $tag"; return 0; }
  local t0=$(date +%s)
  if "$@" > /tmp/q/out/_bf_tmp.json 2>&1; then
    python - "$tag" < /tmp/q/out/_bf_tmp.json >> "$out" <<'PY'
import json, sys
line = [l for l in sys.stdin.read().splitlines() if l.strip().startswith('{')]
rec = json.loads(line[-1]) if line else {}
rec['tag'] = sys.argv[1]
print(json.dumps(rec))
PY
  else
    tail -3 /tmp/q/out/_bf_tmp.json; return 1
  fi
}
run bifuse_bilinear_b8 timeout 1200 python scripts/pano_bench.py zoo/bifuse_final.params.npz 8 || rc=1
run bifuse_fast_b8 timeout 1200 env PANODEPTH_BIFUSE_PROJ=fast python scripts/pano_bench.py zoo/bifuse_final.params.npz 8 || rc=1
run bifuse_fast_b24 timeout 1200 env PANODEPTH_BIFUSE_PROJ=fast python scripts/pano_bench.py zoo/bifuse_final.params.npz 24 || rc=1
run slicenet_unroll_b8 timeout 1200 python scripts/pano_bench.py zoo/slicenet_final.params.npz 8 || rc=1
run slicenet_unroll_b24 timeout 1200 python scripts/pano_bench.py zoo/slicenet_final.params.npz 24 || rc=1
run pano_fast_b24 timeout 1200 env PANODEPTH_PANO_PROJ=fast python scripts/pano_bench.py zoo/panoramic_final.params.npz 24 || rc=1
# held-out evals of the fast bifuse graph (vs zoo/README 0.0101/0.0116)
for sc in v1 v2; do
  grep -q "\"tag\": \"bifuse_fast_eval_$sc\"" "$out" && { echo "skip eval $sc"; continue; }
  if PANODEPTH_BIFUSE_PROJ=fast timeout 1200 python -m panodepth.models.evaluate \
      zoo/bifuse_final.params.npz --scenes $sc > /tmp/q/out/_bf_tmp.json 2>&1; then
    python - "bifuse_fast_eval_$sc" < /tmp/q/out/_bf_tmp.json >> "$out" <<'PY'
import json, sys
line = [l for l in sys.stdin.read().splitlines() if l.strip().startswith('{')]
rec = json.loads(line[-1]) if line else {}
rec['tag'] = sys.argv[1]
print(json.dumps(rec))
PY
  else
    tail -3 /tmp/q/out/_bf_tmp.json; rc=1
  fi
done
cat "$out"
exit $rc
