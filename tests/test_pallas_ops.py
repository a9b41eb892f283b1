"""Pallas kernel tests (interpret mode on CPU; the same code compiles with
Mosaic on TPU — exactness vs the scan implementation is also asserted in the
TPU verification flow)."""

import jax
import jax.numpy as jnp
import numpy as np

from ev2hands_tpu.ops.pallas_ops import fps_auto, fps_pallas
from ev2hands_tpu.ops.pointnet import farthest_point_sample


def test_fps_pallas_matches_scan_interpret(rng):
    B, N, S = 4, 256, 64
    xyz = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    ref = farthest_point_sample(xyz, S)
    got = fps_pallas(xyz, S, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fps_pallas_respects_start(rng):
    B, N, S = 2, 128, 16
    xyz = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    start = jnp.asarray([7, 99], jnp.int32)
    ref = farthest_point_sample(xyz, S, start_idx=None)
    got = fps_pallas(xyz, S, start=start, interpret=True)
    assert np.asarray(got)[0, 0] == 7
    assert np.asarray(got)[1, 0] == 99
    # a different start produces a (generally) different sampling
    got0 = fps_pallas(xyz, S, interpret=True)
    assert np.asarray(got0)[0, 0] == 0
    del ref


def test_fps_auto_dispatches_on_cpu(rng):
    # on the CPU test platform fps_auto must take the scan path (no Mosaic)
    xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    got = fps_auto(xyz, 8)
    ref = farthest_point_sample(xyz, 8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_grouping_kernel_interpret(rng):
    """Experimental fused dense-grouping kernel: exact vs the gather
    reference in interpret mode (see ops/pallas_grouping.py STATUS)."""
    import jax.numpy as jnp

    from ev2hands_tpu.ops.pallas_grouping import (
        dense_msg_scale_pallas,
        fold_scale_params,
    )
    from ev2hands_tpu.ops.pointnet import index_points, query_ball_point

    B, S, N = 2, 32, 256
    xyz = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(B, N, 5), jnp.float32)
    new_xyz = xyz[:, :S]
    r, K = 0.5, 8

    conv, bn = [], []
    last = 8
    for C in (16, 16, 32):
        conv.append({
            "kernel": jnp.asarray(rng.randn(last, C) * 0.2, jnp.float32),
            "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        })
        bn.append({
            "scale": jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32),
            "bias": jnp.asarray(0.1 * rng.randn(C), jnp.float32),
            "mean": jnp.asarray(0.1 * rng.randn(C), jnp.float32),
            "var": jnp.asarray(np.abs(rng.randn(C)) + 0.5, jnp.float32),
        })
        last = C

    folded = fold_scale_params(feats, xyz, new_xyz, conv, bn)
    got = dense_msg_scale_pallas(
        xyz, new_xyz, folded, r, K, sb=16, nb=128, interpret=True
    )

    def bn_eval(x, p):
        return (x - p["mean"]) / jnp.sqrt(p["var"] + 1e-5) * p["scale"] + p["bias"]

    idx = query_ball_point(r, K, xyz, new_xyz)
    h = jnp.concatenate(
        [index_points(feats, idx), index_points(xyz, idx) - new_xyz[:, :, None, :]],
        -1,
    )
    for cp, bp in zip(conv, bn):
        h = jax.nn.relu(bn_eval(h @ cp["kernel"] + cp["bias"], bp))
    ref = h.max(axis=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_grouping_kernel_2d_interpret(rng):
    """Production v2 kernel (2-D per-centroid tiles, wired into
    SetAbstractionMsg on TPU): exact vs the gather reference in interpret
    mode, including the precomputed selection mask + point-0 fallback."""
    import jax.numpy as jnp

    from ev2hands_tpu.ops.pallas_grouping import (
        dense_msg_scale_pallas_2d,
        dense_selection_mask,
        fold_scale_params,
    )
    from ev2hands_tpu.ops.pointnet import index_points, query_ball_point

    B, S, N = 2, 32, 256
    xyz = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(B, N, 5), jnp.float32)
    new_xyz = xyz[:, :S]
    r, K = 0.5, 8

    conv, bn = [], []
    last = 8
    for C in (16, 16, 32):
        conv.append({
            "kernel": jnp.asarray(rng.randn(last, C) * 0.2, jnp.float32),
            "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        })
        bn.append({
            "scale": jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32),
            "bias": jnp.asarray(0.1 * rng.randn(C), jnp.float32),
            "mean": jnp.asarray(0.1 * rng.randn(C), jnp.float32),
            "var": jnp.asarray(np.abs(rng.randn(C)) + 0.5, jnp.float32),
        })
        last = C

    folded = fold_scale_params(feats, xyz, new_xyz, conv, bn)
    sel = dense_selection_mask(xyz, new_xyz, r, K)
    got = dense_msg_scale_pallas_2d(folded, sel, sb=8, interpret=True)

    def bn_eval(x, p):
        return (x - p["mean"]) / jnp.sqrt(p["var"] + 1e-5) * p["scale"] + p["bias"]

    idx = query_ball_point(r, K, xyz, new_xyz)
    h = jnp.concatenate(
        [index_points(feats, idx), index_points(xyz, idx) - new_xyz[:, :, None, :]],
        -1,
    )
    for cp, bp in zip(conv, bn):
        h = jax.nn.relu(bn_eval(h @ cp["kernel"] + cp["bias"], bp))
    ref = h.max(axis=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
