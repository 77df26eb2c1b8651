#!/bin/bash
# r5 task 2 (VERDICT #2): b1 latency decomposition (rtt / upload / graph /
# stage split / vp-on-1-device) of the shipping e2e configuration.
cd /root/repo
timeout 2400 python scripts/latency_profile.py \
    > /tmp/q/out/latency_profile.json 2>&1
rc=$?
tail -3 /tmp/q/out/latency_profile.json
exit $rc
