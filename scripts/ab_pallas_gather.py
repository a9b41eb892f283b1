"""On-TPU exactness + A/B for the one-hot MXU gather (ops/pallas_gather.py).

Three measurements at sa1-like shapes (B=8, N=2048, S=512, K=(32,64,128)):
  1. compiled-kernel bitwise exactness vs index_points (real MXU, not
     interpret mode) — the f32 hi|mid|lo channel-stack claim;
  2. honest op-level A/B: {ball query + gather} old vs new formulation
     (device_throughput, key-perturbed inputs — the documented hoist trap);
  3. full jitted train step A/B via ModelConfig.pallas_gather on/off.

Run on the REAL TPU with an otherwise-idle host:
    python scripts/ab_pallas_gather.py [--step-only]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def op_level(B=8, N=2048, S=512, nb=128):
    from ev2hands_tpu.ops.pallas_gather import (
        grouped_gather, pos_tile_activity,
    )
    from ev2hands_tpu.ops.pallas_grouping import morton_perm
    from ev2hands_tpu.ops.pointnet import (
        index_points, query_ball_point, query_ball_point_permuted,
        square_distance,
    )
    from ev2hands_tpu.utils.profiling import device_throughput

    SCALES = ((0.1, 32), (0.2, 64), (0.4, 128))
    rng = np.random.RandomState(0)
    xyz0 = jnp.asarray(np.clip(rng.randn(B, N, 3) * 0.4, -1, 1), jnp.float32)
    feats0 = jnp.asarray(rng.randn(B, N, 5).astype(np.float32))
    # replace=False is over the TOTAL size in numpy; sample per batch row.
    fps0 = jnp.asarray(np.stack([
        rng.choice(N, size=S, replace=False) for _ in range(B)
    ]).astype(np.int32))

    def old_fn(xyz, feats, new_xyz):
        sq = square_distance(new_xyz, xyz)
        idxs = [query_ball_point(r, K, xyz, new_xyz, sqrdists=sq)
                for r, K in SCALES]
        cat = jnp.concatenate(idxs, axis=-1)
        src = jnp.concatenate([feats, xyz], axis=-1)
        return index_points(src, cat)

    def new_fn(xyz, feats, new_xyz):
        perm = morton_perm(xyz)
        xyz_p = jnp.take_along_axis(xyz, perm[..., None], axis=1)
        feats_p = jnp.take_along_axis(feats, perm[..., None], axis=1)
        sq_p = square_distance(new_xyz, xyz_p)
        poss = [query_ball_point_permuted(r, K, perm, sq_p)
                for r, K in SCALES]
        cat = jnp.concatenate(poss, axis=-1)
        src_p = jnp.concatenate([feats_p, xyz_p], axis=-1)
        act = pos_tile_activity(cat, nb, N)
        return grouped_gather(src_p, cat, act, nb=nb)

    new_xyz0 = index_points(xyz0, fps0)
    a = jax.jit(old_fn)(xyz0, feats0, new_xyz0)
    b = jax.jit(new_fn)(xyz0, feats0, new_xyz0)
    exact = bool(jnp.all(a == b))
    print(json.dumps({"bitwise_equal_on_tpu": exact,
                      "max_abs_diff": float(jnp.max(jnp.abs(a - b)))}),
          flush=True)

    def jitter(k):
        d = jax.random.normal(k, (B, N, 3)) * 1e-3
        return xyz0 + d, feats0 + d[..., :1], index_points(xyz0 + d, fps0)

    for name, fn in (("old_gather", old_fn), ("new_pallas_gather", new_fn)):
        sec = device_throughput(lambda k, fn=fn: fn(*jitter(k)), iters=20)
        print(json.dumps({name + "_ms": round(sec * 1e3, 3)}), flush=True)


def op_level_wide(B=8, N=512, S=128, nb=128):
    """sa2 shapes: 320-feature source rows, K=(64,128) — the wide-C kernel
    path (128-lane hi|mid|lo segments) vs the XLA gather it replaces."""
    from ev2hands_tpu.ops.pallas_gather import (
        grouped_gather, pos_tile_activity,
    )
    from ev2hands_tpu.ops.pallas_grouping import morton_perm
    from ev2hands_tpu.ops.pointnet import (
        index_points, query_ball_point, query_ball_point_permuted,
        square_distance,
    )
    from ev2hands_tpu.utils.profiling import device_throughput

    SCALES = ((0.4, 64), (0.8, 128))
    D = 320
    rng = np.random.RandomState(0)
    xyz0 = jnp.asarray(np.clip(rng.randn(B, N, 3) * 0.4, -1, 1), jnp.float32)
    feats0 = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    fps0 = jnp.asarray(np.stack([
        rng.choice(N, size=S, replace=False) for _ in range(B)
    ]).astype(np.int32))

    def old_fn(xyz, feats, new_xyz):
        sq = square_distance(new_xyz, xyz)
        idxs = [query_ball_point(r, K, xyz, new_xyz, sqrdists=sq)
                for r, K in SCALES]
        cat = jnp.concatenate(idxs, axis=-1)
        src = jnp.concatenate([feats, xyz], axis=-1)
        return index_points(src, cat)

    def new_fn(xyz, feats, new_xyz):
        perm = morton_perm(xyz)
        xyz_p = jnp.take_along_axis(xyz, perm[..., None], axis=1)
        feats_p = jnp.take_along_axis(feats, perm[..., None], axis=1)
        sq_p = square_distance(new_xyz, xyz_p)
        poss = [query_ball_point_permuted(r, K, perm, sq_p)
                for r, K in SCALES]
        cat = jnp.concatenate(poss, axis=-1)
        src_p = jnp.concatenate([feats_p, xyz_p], axis=-1)
        act = pos_tile_activity(cat, nb, N)
        return grouped_gather(src_p, cat, act, nb=nb)

    new_xyz0 = index_points(xyz0, fps0)
    a = jax.jit(old_fn)(xyz0, feats0, new_xyz0)
    b = jax.jit(new_fn)(xyz0, feats0, new_xyz0)
    exact = bool(jnp.all(a == b))
    print(json.dumps({"wide_bitwise_equal_on_tpu": exact,
                      "max_abs_diff": float(jnp.max(jnp.abs(a - b)))}),
          flush=True)

    def jitter(k):
        d = jax.random.normal(k, (B, N, 3)) * 1e-3
        return xyz0 + d, feats0 + d[..., :1], index_points(xyz0 + d, fps0)

    for name, fn in (("wide_old_gather", old_fn),
                     ("wide_new_pallas_gather", new_fn)):
        sec = device_throughput(lambda k, fn=fn: fn(*jitter(k)), iters=20)
        print(json.dumps({name + "_ms": round(sec * 1e3, 3)}), flush=True)


def step_level(batch=8, n=2048):
    import bench as B

    # interleaved A/B (two runs each) to factor out slow-tunnel drift
    cfgs = [
        {"pallas_gather": False},
        {"pallas_gather": True, "pallas_gather_wide": False},
        {"pallas_gather": True},
        {"pallas_gather": True, "pallas_gather_bwd": True},
    ]
    for rep in range(2):
        for kw in cfgs:
            ws = B.measure_train_step(batch_size=batch, n_points=n, **kw)
            print(json.dumps({"rep": rep, **kw,
                              "train_windows_per_s": round(ws, 1)}),
                  flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-only", action="store_true")
    ap.add_argument("--op-only", action="store_true")
    ap.add_argument("--nb", type=int, default=128)
    args = ap.parse_args()
    if not args.step_only:
        op_level(nb=args.nb)
        op_level_wide(nb=args.nb)
    if not args.op_only:
        step_level()
