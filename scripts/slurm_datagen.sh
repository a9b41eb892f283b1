#!/bin/bash
# Sharded synthetic data generation across a SLURM array (the reference's
# slurm_main.sh pattern: count % N_WORKERS == WORKER_ID job sharding).
#
#SBATCH --array=0-7
#SBATCH --time=48:00:00
#SBATCH --mem=64G
#
# Usage: GENERATION_MODE=train sbatch scripts/slurm_datagen.sh
set -euo pipefail
MODE="${GENERATION_MODE:-train}"
python - <<PY
from ev2hands_tpu.config import DEFAULT_CONFIG
from ev2hands_tpu.datagen.generate import generate
from ev2hands_tpu.datagen.interhand import InterHandAnnotations
from ev2hands_tpu.datagen.interpolate import interpolate_sequence
from ev2hands_tpu.mano import load_mano_models
import os

cfg = DEFAULT_CONFIG
models = load_mano_models(cfg.mano.model_path)
anno = InterHandAnnotations(os.environ["INTERHAND_ROOT"], "$MODE")

def sequences():
    for cap in anno.capture_ids():
        yield interpolate_sequence(
            anno.sequence(cap), cfg.esim.interpolation_fps / 6, cfg.esim.interpolation_fps
        )

generate(
    sequences(), models, out_dir=f"data/Ev2Hands-S/parts_$MODE", mode="$MODE",
    cfg=cfg,
    n_workers=int(os.environ.get("SLURM_ARRAY_TASK_COUNT", 8)),
    worker_id=int(os.environ.get("SLURM_ARRAY_TASK_ID", 0)),
)
PY
