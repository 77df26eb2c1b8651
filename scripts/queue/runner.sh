#!/bin/bash
# r4 chip-job runner: probe the tunnel, run pending jobs in order under the
# chip flock, retry wedged jobs up to 3x. Stop by touching /tmp/q/STOP.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"
export PANODEPTH_HAVE_CHIP_LOCK=1
log=/tmp/q/runner.log
echo "=== runner start $(date -u +%F' '%T)" >> "$log"
while true; do
  if [ -e /tmp/q/STOP ]; then echo "STOP seen $(date -u +%T)" >> "$log"; sleep 60; continue; fi
  job=$(ls /tmp/q/jobs/*.sh 2>/dev/null | head -1)
  if [ -z "${job:-}" ]; then echo "queue empty $(date -u +%T)" >> "$log"; sleep 120; continue; fi
  s=$(( (RANDOM % 191) + 67 ))
  if ! timeout 100 python -c "import jax, jax.numpy as jnp; print('probe ok', float(jnp.sum(jnp.ones(($s, $((s+41))))*2.0)))" >> "$log" 2>&1; then
    echo "wedged $(date -u +%T) shape=$s" >> "$log"; sleep 150; continue
  fi
  echo "RUN $job $(date -u +%F' '%T)" >> "$log"
  flock /tmp/panodepth_chip.lock bash "$job" >> "$log" 2>&1
  rc=$?
  echo "DONE $job rc=$rc $(date -u +%F' '%T)" >> "$log"
  if [ $rc -eq 0 ]; then
    mv "$job" /tmp/q/done/
  else
    t=$(cat "$job.tries" 2>/dev/null || echo 0); t=$((t+1))
    if [ $t -ge 3 ]; then mv "$job" /tmp/q/failed/; rm -f "$job.tries"
    else echo $t > "$job.tries"; sleep 90; fi
  fi
done
