"""On-TPU A/B for mixed-precision training (ModelConfig.bf16_train).

Full jitted train step (device ERPC + fwd + MANO + losses + bwd + Adam)
with the conv chains in f32 vs bfloat16, interleaved reps to factor out
slow-tunnel drift, at the published B=8 and at B=16 (bf16 halves the
activation bytes, so the win can grow with batch). Optionally crossed with
pallas_gather (the two optimizations touch disjoint parts of the step).

Run on the REAL TPU with an otherwise-idle host:
    python scripts/ab_bf16.py
"""

import json
import sys

sys.path.insert(0, ".")

import bench as B


def main():
    cfgs = [
        {"bf16_train": False},
        {"bf16_train": True},
        {"bf16_train": True, "pallas_gather": True},
    ]
    for batch in (8, 16):
        for rep in range(2):
            for kw in cfgs:
                ws = B.measure_train_step(batch_size=batch, **kw)
                print(json.dumps({"batch": batch, "rep": rep, **kw,
                                  "train_windows_per_s": round(ws, 1)}),
                      flush=True)


if __name__ == "__main__":
    main()
