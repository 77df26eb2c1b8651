#!/bin/bash
# FastPanoNet cycle diagnosis: wrap-pad concat cost vs GroupNorm cost.
cd /root/repo
timeout 1800 python scripts/fastpano_diag.py 24 > /tmp/q/out/fastpano_diag.json 2>&1
rc=$?
tail -2 /tmp/q/out/fastpano_diag.json
exit $rc
