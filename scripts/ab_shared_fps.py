"""On-TPU A/B for ModelConfig.shared_head_fps (one FPS draw for both
regressor heads during random-FPS training).

Context: the published train-step bench pins ``fps_deterministic=True``,
whose keys-are-None path already shares one sampling across the heads
(XLA CSEs the sa1 ball-query/sqrdist machinery given identical
``reg_fps_idx``). Production training defaults to the reference's RANDOM
per-head FPS draws (``TEHNet.py:194-195``) and pays that machinery twice.
``shared_head_fps=True`` keeps the start index random (one draw, keys[2])
but feeds both heads, recovering the CSE while staying an unbiased FPS
sampling — a documented training-semantics deviation like ``bf16_train``.

Full jitted train step (device ERPC + fwd + MANO + losses + bwd + Adam),
interleaved reps, at the published B=8 and at B=16; bf16 cross at B=8.

Run on the REAL TPU with an otherwise-idle host:
    python scripts/ab_shared_fps.py
"""

import json
import sys

sys.path.insert(0, ".")

import bench as B


def main():
    cfgs = [
        {"fps_deterministic": True},                           # published
        {"fps_deterministic": False},                          # production
        {"fps_deterministic": False, "shared_head_fps": True}, # candidate
        {"fps_deterministic": False, "shared_head_fps": True,
         "bf16_train": True},
    ]
    results = []
    for batch in (8, 16):
        for rep in range(2):
            for kw in cfgs:
                if batch == 16 and kw.get("bf16_train"):
                    continue
                ws = B.measure_train_step(batch_size=batch, **kw)
                row = {"batch": batch, "rep": rep, **kw,
                       "train_windows_per_s": round(ws, 1)}
                results.append(row)
                print(json.dumps(row), flush=True)
    with open("artifacts/ab_shared_fps.json", "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
