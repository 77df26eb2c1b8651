#!/bin/bash
# r5 task 5 (VERDICT #5): 4096 e2e batch sweep around b8 + stage split
# (the 2048 sweep was sharp: b20/24/28 = 235/275/182 — the 4096 graph's
# sweet spot has never been measured).
cd /root/repo
out=/tmp/q/out/sweep4096.jsonl
touch "$out"
rc=0
for b in 4 6 8 10 12 16; do
  grep -q "\"batch\": $b," "$out" && { echo "skip b$b"; continue; }
  if PANODEPTH_PROFILE_WIDTH=4096 timeout 2400 python scripts/e2e_profile.py $b \
      > /tmp/q/out/_s4_tmp.json 2>&1; then
    grep '^{' /tmp/q/out/_s4_tmp.json | tail -1 >> "$out"
  else
    tail -3 /tmp/q/out/_s4_tmp.json; rc=1
  fi
done
cat "$out"
exit $rc
