#!/bin/bash
cd /root/repo
timeout 1200 python scripts/int8_probe.py > /tmp/q/out/int8.json 2>/tmp/q/out/int8.err
rc=$?
cat /tmp/q/out/int8.json
exit $rc
