#!/bin/bash
# Round-close: fresh full bench capture (keeps the ledger warm so the
# driver's round-end run replays nothing stale; VERDICT r5 #6).
cd /root/repo
timeout 3000 python bench.py > /tmp/q/out/bench_final.txt 2>&1
rc=$?
tail -8 /tmp/q/out/bench_final.txt
exit $rc
