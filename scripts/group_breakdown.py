"""Honest on-device breakdown of the sa1 grouping machinery (train path).

The gather-mode training forward spends ~22.9 ms of its 43.5 ms (B=8,
N=2048) in the sa1 group machinery: FPS + shared sqrdists + three ball
queries + one concatenated neighbor gather. This script times NESTED
PREFIXES of that chain with `utils.profiling.device_throughput` — inputs
jittered per iteration from the scan key so XLA cannot hoist any stage out
of the timing loop (the documented measurement trap) — and reports the
per-stage deltas. Reference machinery being decomposed:
``pointnet2_utils.py:19-40`` (square_distance), ``:63-84`` (FPS),
``:87-107`` (query_ball_point), ``:168-196`` (grouping gathers).

Run on the REAL TPU with an otherwise-idle host:
    python scripts/group_breakdown.py [--batch 8] [--n 2048]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from ev2hands_tpu.ops.pallas_ops import fps_auto
    from ev2hands_tpu.ops.pointnet import (
        index_points, query_ball_point, square_distance,
    )
    from ev2hands_tpu.utils.profiling import device_throughput

    B, N = args.batch, args.n
    S = 512
    SCALES = ((0.1, 32), (0.2, 64), (0.4, 128))

    rng = np.random.RandomState(0)
    xyz0 = jnp.asarray(np.clip(rng.randn(B, N, 3) * 0.4, -1, 1), jnp.float32)
    feats0 = jnp.asarray(rng.randn(B, N, 5).astype(np.float32))

    def jitter(k):
        # key-dependent input: same point cloud, per-iteration perturbation
        return xyz0 + jax.random.normal(k, (B, N, 3)) * 1e-3

    def stage_fps(k):
        return fps_auto(jitter(k), S)

    def stage_sqrdists(k):
        xyz = jitter(k)
        fps_idx = fps_auto(xyz, S)
        new_xyz = index_points(xyz, fps_idx)
        return square_distance(new_xyz, xyz)

    def stage_ballq(k):
        xyz = jitter(k)
        fps_idx = fps_auto(xyz, S)
        new_xyz = index_points(xyz, fps_idx)
        sq = square_distance(new_xyz, xyz)
        idxs = [query_ball_point(r, K, xyz, new_xyz, sqrdists=sq)
                for r, K in SCALES]
        return jnp.concatenate(idxs, axis=-1)

    def stage_gather(k):
        xyz = jitter(k)
        fps_idx = fps_auto(xyz, S)
        new_xyz = index_points(xyz, fps_idx)
        sq = square_distance(new_xyz, xyz)
        idxs = [query_ball_point(r, K, xyz, new_xyz, sqrdists=sq)
                for r, K in SCALES]
        cat_idx = jnp.concatenate(idxs, axis=-1)           # [B, S, sum(K)]
        src = jnp.concatenate([feats0, xyz], axis=-1)      # [B, N, 8]
        return index_points(src, cat_idx)                  # [B, S, 224, 8]

    stages = [
        ("fps", stage_fps),
        ("fps+sqrdists", stage_sqrdists),
        ("fps+sqrdists+3xballq", stage_ballq),
        ("fps+sqrdists+3xballq+gather", stage_gather),
    ]

    out, prev = {}, 0.0
    for name, fn in stages:
        sec = device_throughput(fn, iters=args.iters)
        ms = sec * 1e3
        out[name] = {"ms": round(ms, 3), "delta_ms": round(ms - prev, 3)}
        prev = ms
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"config": {"B": B, "N": N, "S": S}, "stages": out}))


if __name__ == "__main__":
    main()
