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


def _random_scale_params(rng, d_in, widths=(16, 16, 32)):
    conv, bn = [], []
    last = d_in
    for C in widths:
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
    return conv, bn


def _gather_reference(xyz, feats, new_xyz, r, K, conv, bn):
    from ev2hands_tpu.ops.pointnet import index_points, query_ball_point

    def bn_eval(x, p):
        return (x - p["mean"]) / jnp.sqrt(p["var"] + 1e-5) * p["scale"] + p["bias"]

    idx = query_ball_point(r, K, xyz, new_xyz)
    h = jnp.concatenate(
        [index_points(feats, idx), index_points(xyz, idx) - new_xyz[:, :, None, :]],
        -1,
    )
    for cp, bp in zip(conv, bn):
        h = jax.nn.relu(bn_eval(h @ cp["kernel"] + cp["bias"], bp))
    return h.max(axis=2)


def test_morton_perm_is_spatial_permutation(rng):
    from ev2hands_tpu.ops.pallas_grouping import morton_perm

    B, N = 3, 256
    xyz = jnp.asarray(np.clip(rng.randn(B, N, 3) * 0.4, -1, 1), jnp.float32)
    perm = np.asarray(morton_perm(xyz))
    for b in range(B):
        assert np.array_equal(np.sort(perm[b]), np.arange(N))
    # spatially sorted: consecutive points are closer on average than random
    xp = np.take_along_axis(np.asarray(xyz), perm[..., None], axis=1)
    d_sorted = np.linalg.norm(np.diff(xp, axis=1), axis=-1).mean()
    d_orig = np.linalg.norm(np.diff(np.asarray(xyz), axis=1), axis=-1).mean()
    assert d_sorted < 0.5 * d_orig


def test_sparse_grouping_kernel_interpret(rng):
    """PRODUCTION sparse kernel (wired into SetAbstractionMsg for the sa1
    scales on TPU): Morton-ordered points, column-permuted selection mask,
    per-tile activity skip — exact vs the gather reference, incl. the
    point-0 fallback for an empty neighborhood."""
    from ev2hands_tpu.ops.pallas_grouping import (
        FoldedScale,
        dense_msg_scale_pallas_sparse,
        dense_selection_mask,
        fold_scale_params,
        morton_perm,
        permute_columns,
        tile_activity,
    )

    B, S, N, nb = 2, 32, 256, 32
    xyz = jnp.asarray(np.clip(rng.randn(B, N, 3) * 0.4, -1, 1), jnp.float32)
    feats = jnp.asarray(rng.randn(B, N, 5), jnp.float32)
    new_xyz = xyz[:, :S]
    # centroid 5 far away -> empty neighborhood -> point-0 fallback
    new_xyz = new_xyz.at[:, 5, :].set(jnp.asarray([7.0, 7.0, 7.0]))
    r, K = 0.3, 8
    conv, bn = _random_scale_params(rng, 8)

    perm = morton_perm(xyz)
    xyz_p = jnp.take_along_axis(xyz, perm[..., None], axis=1)
    feats_p = jnp.take_along_axis(feats, perm[..., None], axis=1)
    folded = fold_scale_params(feats_p, xyz_p, new_xyz, conv, bn)
    sel = dense_selection_mask(xyz, new_xyz, r, K)
    sel_p = permute_columns(sel, perm)
    act = tile_activity(sel_p, nb)
    # sparsity is real on clustered clouds
    assert float(jnp.mean(act.astype(jnp.float32))) < 0.9

    got = dense_msg_scale_pallas_sparse(
        folded, sel_p, act, sb=8, nb=nb, interpret=True
    )
    ref = _gather_reference(xyz, feats, new_xyz, r, K, conv, bn)
    keep = np.asarray([s for s in range(S) if s != 5])
    np.testing.assert_allclose(
        np.asarray(got)[:, keep], np.asarray(ref)[:, keep], atol=2e-5
    )
    # empty neighborhood: the dense/sparse convention is the point-0 fallback
    # (the gather path clamps differently; unreachable with FPS centroids)
    pos0 = jnp.argmax(perm == 0, axis=1)  # point 0's Morton position, per b
    u0 = jnp.take_along_axis(folded.u, pos0[:, None, None], axis=1)[:, 0, :]
    h0 = jax.nn.relu(u0 - folded.v[:, 5, :])
    h0 = jax.nn.relu(h0 @ folded.W2 + folded.b2)
    h0 = jax.nn.relu(h0 @ folded.W3 + folded.b3)
    np.testing.assert_allclose(
        np.asarray(got)[:, 5], np.asarray(h0), atol=2e-5
    )


def test_fused_selection_kernel_interpret(rng):
    """v5 kernel (in-kernel distances + first-K-by-index rank, documented
    exploration): exact vs the gather reference."""
    from ev2hands_tpu.ops.pallas_grouping import (
        fold_scale_params,
        fused_msg_scale_pallas,
    )

    B, S, N = 2, 32, 256
    xyz = jnp.asarray(np.clip(rng.randn(B, N, 3) * 0.4, -1, 1), jnp.float32)
    feats = jnp.asarray(rng.randn(B, N, 5), jnp.float32)
    new_xyz = xyz[:, :S]
    new_xyz = new_xyz.at[:, 3, :].set(jnp.asarray([7.0, 7.0, 7.0]))
    r, K = 0.3, 8
    conv, bn = _random_scale_params(rng, 8)

    folded = fold_scale_params(feats, xyz, new_xyz, conv, bn)
    got = fused_msg_scale_pallas(
        xyz, new_xyz, folded, r, K, sb=8, nb=64, interpret=True
    )
    ref = _gather_reference(xyz, feats, new_xyz, r, K, conv, bn)
    keep = np.asarray([s for s in range(S) if s != 3])
    np.testing.assert_allclose(
        np.asarray(got)[:, keep], np.asarray(ref)[:, keep], atol=2e-5
    )
    # empty neighborhood -> point-0 fallback (dense-path convention)
    h0 = jax.nn.relu(folded.u[:, 0, :] - folded.v[:, 3, :])
    h0 = jax.nn.relu(h0 @ folded.W2 + folded.b2)
    h0 = jax.nn.relu(h0 @ folded.W3 + folded.b3)
    np.testing.assert_allclose(
        np.asarray(got)[:, 3], np.asarray(h0), atol=2e-5
    )


def test_sparse_grouping_kernel_interpret_n4096(rng):
    """The N<=2048 cap is gone: morton_perm's packed key adapts its index
    field to N (12 bits at 4096, full 6-bit morton resolution retained), and
    the sparse kernel stays exact vs the gather reference at N=4096 — the
    single-chip large-N path no longer silently falls back to XLA dense."""
    from ev2hands_tpu.ops.pallas_grouping import (
        dense_msg_scale_pallas_sparse,
        dense_selection_mask,
        fold_scale_params,
        morton_perm,
        permute_columns,
        tile_activity,
    )

    B, S, N, nb = 1, 16, 4096, 256
    xyz = jnp.asarray(np.clip(rng.randn(B, N, 3) * 0.4, -1, 1), jnp.float32)
    feats = jnp.asarray(rng.randn(B, N, 5), jnp.float32)
    new_xyz = xyz[:, :S]
    r, K = 0.25, 8
    conv, bn = _random_scale_params(rng, 8)

    perm = morton_perm(xyz)
    for b in range(B):
        assert np.array_equal(np.sort(np.asarray(perm[b])), np.arange(N))
    xyz_p = jnp.take_along_axis(xyz, perm[..., None], axis=1)
    feats_p = jnp.take_along_axis(feats, perm[..., None], axis=1)
    folded = fold_scale_params(feats_p, xyz_p, new_xyz, conv, bn)
    sel = dense_selection_mask(xyz, new_xyz, r, K)
    sel_p = permute_columns(sel, perm)
    act = tile_activity(sel_p, nb)
    assert float(jnp.mean(act.astype(jnp.float32))) < 0.7  # sparsity is real

    got = dense_msg_scale_pallas_sparse(
        folded, sel_p, act, sb=8, nb=nb, interpret=True
    )
    ref = _gather_reference(xyz, feats, new_xyz, r, K, conv, bn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_scales_kernel_matches_per_scale_interpret(rng):
    """v6 (one block-sparse pass over ALL MSG scales, block-diagonal stacked
    weights, union tile activity) must match the concatenation of the
    per-scale production kernel — incl. nested radii, different widths per
    scale, and an empty neighborhood (point-0 fallback bit in the mask)."""
    from ev2hands_tpu.ops.pallas_grouping import (
        dense_msg_fused_scales_pallas_sparse,
        dense_msg_scale_pallas_sparse,
        dense_selection_mask,
        fold_scale_params,
        morton_perm,
        permute_columns,
        stack_folded_scales,
        tile_activity,
    )

    B, S, N, nb = 2, 16, 256, 32
    xyz = jnp.asarray(np.clip(rng.randn(B, N, 3) * 0.4, -1, 1), jnp.float32)
    feats = jnp.asarray(rng.randn(B, N, 5), jnp.float32)
    new_xyz = xyz[:, :S]
    new_xyz = new_xyz.at[:, 3, :].set(jnp.asarray([7.0, 7.0, 7.0]))  # empty
    radii = (0.15, 0.3, 0.6)
    ks = (4, 8, 16)
    widths = ((8, 8, 16), (16, 16, 32), (16, 24, 32))  # sa1-style mix

    perm = morton_perm(xyz)
    xyz_p = jnp.take_along_axis(xyz, perm[..., None], axis=1)
    feats_p = jnp.take_along_axis(feats, perm[..., None], axis=1)

    folded_list, sels, refs = [], [], []
    for r, K, w in zip(radii, ks, widths):
        conv, bn = _random_scale_params(rng, 8, widths=w)
        folded = fold_scale_params(feats_p, xyz_p, new_xyz, conv, bn)
        sel_p = permute_columns(
            dense_selection_mask(xyz, new_xyz, r, K), perm
        )
        folded_list.append(folded)
        sels.append(sel_p)
        refs.append(dense_msg_scale_pallas_sparse(
            folded, sel_p, tile_activity(sel_p, nb),
            sb=8, nb=nb, interpret=True,
        ))

    stacked, sections = stack_folded_scales(folded_list)
    assert sections == (16, 32, 32)
    sel_all = jnp.stack(sels, axis=1)                       # [B, R, S, N]
    act_union = jnp.stack(
        [tile_activity(s, nb) for s in sels], axis=1
    ).max(axis=1)
    # the union skip must still skip something on a clustered cloud
    assert float(jnp.mean(act_union.astype(jnp.float32))) < 0.95

    got = dense_msg_fused_scales_pallas_sparse(
        stacked, sel_all, act_union, sections, sb=8, nb=nb, interpret=True
    )
    ref = jnp.concatenate(refs, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
