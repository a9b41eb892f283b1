#!/bin/bash
# Multi-host data-parallel pretraining over DCN: one process per host, each
# owning its local TPU chips; gradients all-reduce over ICI within hosts and
# DCN across them (jax.distributed + the data mesh in parallel/mesh.py).
#
# The reference has no multi-node training (single-process nn.DataParallel,
# src/Ev2Hands/train.py:68); this launcher is the TPU-native equivalent of
# scaling that loop out.
#
#SBATCH --nodes=4
#SBATCH --ntasks-per-node=1
#SBATCH --time=48:00:00
#
# Usage: sbatch scripts/slurm_train.sh /path/to/Ev2Hands-S
set -euo pipefail

DATA_ROOT="${1:?usage: slurm_train.sh DATA_ROOT}"
COORD_HOST=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
COORD="${COORD_HOST}:12345"

srun python -m ev2hands_tpu.train \
    --data_root "$DATA_ROOT" \
    --batch_size "${BATCH_SIZE:-8}" \
    --data_parallel "${SLURM_NTASKS}" \
    --coordinator "$COORD" \
    --num_processes "$SLURM_NTASKS" \
    --process_id "$SLURM_PROCID"
