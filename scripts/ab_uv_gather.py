"""On-TPU A/B for the gather-mode first-conv u/v split
(ModelConfig.uv_split_gather).

Motivation (scripts/gather_scaling.py, TPU v5e): XLA's gather cost is per
ROW and invariant to row BYTES — 7.4 ms for the production row count at 8
and at 128 channels alike. So applying each scale's conv0 per point BEFORE
the neighbor gather (u_n = conv0([f_n, x_n])) and reconstructing the pair
activation as u_n - v_s + b gathers wider rows for free while dropping the
per-pair conv0 dots and the grouped concat/subtract from forward and
backward.

Full jitted train step (device ERPC + fwd + MANO + losses + bwd + Adam),
interleaved reps, at the published B=8 and at B=16; also crossed with
bf16_train (the split shrinks exactly the tensors bf16 halves).

Run on the REAL TPU with an otherwise-idle host:
    python scripts/ab_uv_gather.py
"""

import json
import sys

sys.path.insert(0, ".")

import bench as B


def main():
    cfgs = [
        {"uv_split_gather": False},
        {"uv_split_gather": True},
        {"uv_split_gather": True, "bf16_train": True},
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
