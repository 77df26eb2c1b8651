#!/bin/bash
cd /root/repo
timeout 900 python scripts/persp_ab.py 8 > /tmp/q/out/persp_ab.json 2>/tmp/q/out/persp_ab.err
rc=$?
cat /tmp/q/out/persp_ab.json
exit $rc
