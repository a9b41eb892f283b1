#!/bin/bash
# Round-3 fourth queue: runs after r3_queue3.sh drains. Measures the
# gather-mode u/v first-conv split (ModelConfig.uv_split_gather) at the
# step level, and — if it wins — bench.py gets re-run manually at the
# flipped defaults.
# Same discipline: one job at a time, yield to /tmp/cpu_busy, health-check
# the tunnel between steps.
set -u
cd "$(dirname "$0")/.."

health() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
jax.devices(); x = jnp.ones((256, 256)); (x @ x).block_until_ready()
print('HEALTH_OK')
" 2>&1 | tail -1
}

wait_tpu() {
  for i in $(seq 1 600); do
    while [[ -e /tmp/cpu_busy ]]; do
      echo "[$(date +%H:%M:%S)] q4 waiting: /tmp/cpu_busy held by $(cat /tmp/cpu_busy 2>/dev/null)"
      sleep 120
    done
    out=$(health)
    echo "[$(date +%H:%M:%S)] q4 health attempt $i: $out"
    [[ "$out" == HEALTH_OK ]] && return 0
    sleep 60
  done
  return 1
}

# Wait for queue3: done marker in its log, or its process gone.
while true; do
  grep -q QUEUE3_DONE /tmp/r3_queue3.log 2>/dev/null && break
  qpid=$(cat /tmp/r3_queue3.pid 2>/dev/null || echo 0)
  ps -p "$qpid" > /dev/null 2>&1 || break
  sleep 120
done
echo "[$(date +%H:%M:%S)] queue3 drained"

run_step() {  # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  for try in 1 2; do
    wait_tpu || { echo "QUEUE4_ABORT tpu never up"; exit 1; }
    echo "[$(date +%H:%M:%S)] START $name (try $try)"
    timeout "$tmo" "$@" > "/tmp/r3q_${name}.log" 2>&1
    rc=$?
    echo "[$(date +%H:%M:%S)] END $name rc=$rc"
    [[ $rc -eq 0 ]] && return 0
    tail -3 "/tmp/r3q_${name}.log"
  done
  echo "STEP_FAILED $name"
  return 1
}

run_step uv_gather 7200 python scripts/ab_uv_gather.py
echo "QUEUE4_DONE $(date +%H:%M:%S)"
