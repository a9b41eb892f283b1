#!/bin/bash
# Merge generated parts into the final {mode}.h5 + {mode}_anno.pickle
# (the reference's slurm_stich_mp.sh).
#SBATCH --array=0-2
set -euo pipefail
MODES=(train val test)
MODE="${MODES[${SLURM_ARRAY_TASK_ID:-0}]}"
python - <<PY
import glob
from ev2hands_tpu.datagen.stitch import stitch
parts = sorted(glob.glob(f"data/Ev2Hands-S/parts_$MODE/*.pickle"))
stitch(parts, f"data/Ev2Hands-S/$MODE")
PY
