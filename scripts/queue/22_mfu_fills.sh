#!/bin/bash
cd /root/repo
rc=0
out=/tmp/q/out/mfu_fills.jsonl
touch "$out"
run () { # ckpt batch extra
  key="$(basename $1)_b$2$3"
  if grep -q "$key" "$out".keys 2>/dev/null; then echo "skip $key"; return; fi
  timeout 700 python scripts/pano_bench.py "$1" "$2" $3 >> "$out" 2>/dev/null && echo "$key" >> "$out".keys || rc=1
}
run zoo/bifuse_final.params.npz 8
run zoo/slicenet_final.params.npz 8
run zoo/panoramic_final.params.npz 24
run zoo/hohonet_final.params.npz 24
cat "$out"
exit $rc
