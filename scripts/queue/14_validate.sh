#!/bin/bash
cd /root/repo
timeout 900 python scripts/tpu_validate.py > /tmp/q/out/validate.jsonl 2>/dev/null
rc=$?
cat /tmp/q/out/validate.jsonl
exit $rc
