#!/bin/bash
# Final-configuration ladder at 2048 b24: shipping default vs each lever
# vs the combined candidate (fastpano baseline + box feed + pair16
# extraction).  Throughputs only — each lever's accuracy gate is its own
# proof (jobs 64/70/72).
cd /root/repo
fp=zoo/candidates/fastpano_ft/fastpano_final.params.npz
[ -f "$fp" ] || fp=zoo/candidates/fastpano/fastpano_final.params.npz
[ -f "$fp" ] || { echo "fastpano ckpt missing"; exit 1; }
out=/tmp/q/out/final_config.jsonl
touch "$out"
rc=0
ab() {  # ab <tag> <base_ckpt> [ENV=V ...]
  local tag=$1 base=$2; shift 2
  grep -q "\"tag\": \"$tag\"" "$out" 2>/dev/null && { echo "skip $tag"; return 0; }
  if env "$@" timeout 2400 python scripts/e2e_ab.py \
      zoo/perspective_final.params.npz "$base" > /tmp/q/out/_fc_tmp.json 2>&1; then
    python - "$tag" < /tmp/q/out/_fc_tmp.json >> "$out" <<'PY'
import json, sys
lines = [l for l in sys.stdin.read().splitlines() if l.strip().startswith('{')]
rec = json.loads(lines[-1]) if lines else {}
rec['tag'] = sys.argv[1]
print(json.dumps(rec))
PY
  else
    tail -3 /tmp/q/out/_fc_tmp.json; return 1
  fi
}
ab default zoo/panoramic_final.params.npz || rc=1
ab fastpano "$fp" || rc=1
ab fastpano_box "$fp" PANODEPTH_BASE_FEED=box || rc=1
ab fastpano_box_pair16 "$fp" PANODEPTH_BASE_FEED=box BENCH_E2E_EXTRACT=pair16 || rc=1
ab fastpano_pair16 "$fp" BENCH_E2E_EXTRACT=pair16 || rc=1
# batch sweep on the combined config — the old graph's sharp b24 sweet
# spot need not hold for the cheaper baseline + halved extraction gathers
for b in 20 28 32; do
  ab "fastpano_box_pair16_b$b" "$fp" PANODEPTH_BASE_FEED=box \
      BENCH_E2E_EXTRACT=pair16 BENCH_E2E_BATCH=$b || rc=1
done
cat "$out"
exit $rc
