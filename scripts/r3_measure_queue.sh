#!/bin/bash
# Round-3 unattended TPU measurement queue.
#
# Waits for the TPU tunnel to answer a tiny jit, then runs the pending
# A/B measurements strictly one at a time (1-core host), health-checking
# between steps because the tunnel has multi-hour outages and transient
# ~10x-slow phases (see CLAUDE.md). Each step's stdout is captured to
# /tmp/r3q_<name>.log; progress lines go to stdout.
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
    # Never measure while another heavy job holds the 1-core host
    # (the full pytest suite touches /tmp/cpu_busy while it runs).
    while [[ -e /tmp/cpu_busy ]]; do
      echo "[$(date +%H:%M:%S)] waiting: /tmp/cpu_busy held by $(cat /tmp/cpu_busy 2>/dev/null)"
      sleep 120
    done
    out=$(health)
    echo "[$(date +%H:%M:%S)] health attempt $i: $out"
    [[ "$out" == HEALTH_OK ]] && return 0
    sleep 60
  done
  return 1
}

run_step() {  # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  for try in 1 2 3; do
    wait_tpu || { echo "QUEUE_ABORT tpu never up"; exit 1; }
    echo "[$(date +%H:%M:%S)] START $name (try $try)"
    timeout "$tmo" "$@" > "/tmp/r3q_${name}.log" 2>&1
    rc=$?
    echo "[$(date +%H:%M:%S)] END $name rc=$rc"
    [[ $rc -eq 0 ]] && return 0
    tail -3 "/tmp/r3q_${name}.log"
  done
  echo "STEP_FAILED $name (3 tries)"
  return 1
}

run_step gather_op   3600 python scripts/ab_pallas_gather.py --op-only
run_step gather_step 3600 python scripts/ab_pallas_gather.py --step-only
run_step eval_group  5400 python scripts/ab_eval_grouping.py
run_step gather_scaling 3600 python scripts/gather_scaling.py
run_step bf16        5400 python scripts/ab_bf16.py
run_step serving     3600 python scripts/bench_serving.py
echo "QUEUE_DONE $(date +%H:%M:%S)"
