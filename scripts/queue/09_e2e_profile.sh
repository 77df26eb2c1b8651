#!/bin/bash
cd /root/repo
rc=0
timeout 900 python scripts/e2e_profile.py 24 auto >> /tmp/q/out/e2e_profile.jsonl 2>/dev/null || rc=1
timeout 600 python scripts/e2e_profile.py 24 pair16d >> /tmp/q/out/e2e_profile.jsonl 2>/dev/null || rc=1
cat /tmp/q/out/e2e_profile.jsonl
exit $rc
