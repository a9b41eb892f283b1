#!/bin/bash
# Round-3 follow-on queue: once the primary A/B queue (r3_measure_queue.sh)
# drains, record (1) the bench headline at the still-unflipped defaults and
# (2) a full generate->train->eval->demo artifact, both on the real chip.
# Keeps the same discipline as the primary queue: one job at a time, yield
# to /tmp/cpu_busy, health-check the tunnel between steps.
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
      echo "[$(date +%H:%M:%S)] q2 waiting: /tmp/cpu_busy held by $(cat /tmp/cpu_busy 2>/dev/null)"
      sleep 120
    done
    out=$(health)
    echo "[$(date +%H:%M:%S)] q2 health attempt $i: $out"
    [[ "$out" == HEALTH_OK ]] && return 0
    sleep 60
  done
  return 1
}

# Wait for the primary queue: done marker in its log, or its process gone.
while true; do
  grep -q QUEUE_DONE /tmp/r3_queue_main.log 2>/dev/null && break
  qpid=$(cat /tmp/r3_queue.pid 2>/dev/null || echo 0)
  ps -p "$qpid" > /dev/null 2>&1 || break
  sleep 120
done
echo "[$(date +%H:%M:%S)] primary queue drained"

run_step() {  # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  for try in 1 2; do
    wait_tpu || { echo "QUEUE2_ABORT tpu never up"; exit 1; }
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

run_step bench_preflip 3600 python bench.py
run_step e2e 3600 python scripts/e2e_smoke.py --iters 100 --out /tmp/e2e_r3
cp -f /tmp/e2e_r3/report.json artifacts/e2e_smoke_r3.json 2>/dev/null
echo "QUEUE2_DONE $(date +%H:%M:%S)"
