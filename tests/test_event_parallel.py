"""Event-dimension sharding (context-parallel analogue) tests on the
8-virtual-device CPU mesh: exact equivalence with the single-device dense
computation, including the cross-shard rank offsets and the empty-neighborhood
fallback."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ev2hands_tpu.parallel.event_parallel import (
    EVENT_AXIS,
    event_sharded_dense_scale,
)


def _single_device_reference(xyz, u, new_xyz, v, W2, b2, W3, b3, radius, nsample):
    """Unsharded dense scale with identical semantics."""
    d2 = (
        jnp.sum(new_xyz**2, -1)[:, :, None]
        + jnp.sum(xyz**2, -1)[:, None, :]
        - 2.0 * jnp.einsum("bsc,bnc->bsn", new_xyz, xyz,
                           precision=jax.lax.Precision.HIGHEST)
    )
    mask = d2 <= radius * radius
    rank = jnp.cumsum(mask, -1) - mask
    sel = mask & (rank < nsample)
    N = xyz.shape[1]
    empty = ~jnp.any(mask, axis=-1)
    sel = sel | (empty[..., None] & (jnp.arange(N) == 0))

    z = jax.nn.relu(u[:, None, :, :] - v[:, :, None, :])
    h = jax.nn.relu(jnp.einsum("bsnc,cd->bsnd", z, W2) + b2)
    h = jax.nn.relu(jnp.einsum("bsnc,cd->bsnd", h, W3) + b3)
    return jnp.max(jnp.where(sel[..., None], h, -jnp.inf), axis=2)


def _make_mesh():
    return Mesh(np.asarray(jax.devices()), (EVENT_AXIS,))


def test_event_sharded_matches_single_device(rng):
    B, N, S, C1, C2, C3 = 2, 256, 16, 8, 16, 32
    xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    u = jnp.asarray(rng.randn(B, N, C1) * 0.3, jnp.float32)
    new_xyz = xyz[:, :S]
    v = jnp.asarray(rng.randn(B, S, C1) * 0.3, jnp.float32)
    W2 = jnp.asarray(rng.randn(C1, C2) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.randn(C2) * 0.1, jnp.float32)
    W3 = jnp.asarray(rng.randn(C2, C3) * 0.3, jnp.float32)
    b3 = jnp.asarray(rng.randn(C3) * 0.1, jnp.float32)
    radius, nsample = 0.4, 8

    ref = _single_device_reference(xyz, u, new_xyz, v, W2, b2, W3, b3, radius, nsample)
    mesh = _make_mesh()
    got = event_sharded_dense_scale(
        mesh, xyz, u, new_xyz, v, W2, b2, W3, b3, radius, nsample
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_event_sharded_rank_crosses_shards(rng):
    """nsample small enough that the first-K cutoff lands mid-stream: the
    cross-shard rank offsets must place it identically to the global scan."""
    B, N, S, C1 = 1, 128, 4, 8
    # all points in radius -> selection is purely index-rank-driven
    xyz = jnp.zeros((B, N, 3))
    u = jnp.asarray(rng.randn(B, N, C1), jnp.float32)
    new_xyz = jnp.zeros((B, S, 3))
    v = jnp.asarray(rng.randn(B, S, C1), jnp.float32)
    W2 = jnp.eye(C1); b2 = jnp.zeros(C1)
    W3 = jnp.eye(C1); b3 = jnp.zeros(C1)
    nsample = 5  # cutoff inside shard 0 (each of 8 shards holds 16 points)

    ref = _single_device_reference(xyz, u, new_xyz, v, W2, b2, W3, b3, 1.0, nsample)
    got = event_sharded_dense_scale(
        _make_mesh(), xyz, u, new_xyz, v, W2, b2, W3, b3, 1.0, nsample
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # and a cutoff deep in a later shard
    nsample = 50
    ref = _single_device_reference(xyz, u, new_xyz, v, W2, b2, W3, b3, 1.0, nsample)
    got = event_sharded_dense_scale(
        _make_mesh(), xyz, u, new_xyz, v, W2, b2, W3, b3, 1.0, nsample
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fold_bn_dense_matches_bn(rng):
    from ev2hands_tpu.parallel.event_parallel import fold_bn_dense

    C_in, C_out = 8, 16
    W = jnp.asarray(rng.randn(C_in, C_out) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(C_out) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(C_out) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(C_out) * 0.1, jnp.float32)
    mean = jnp.asarray(rng.randn(C_out) * 0.1, jnp.float32)
    var = jnp.asarray(rng.rand(C_out) + 0.1, jnp.float32)

    x = jnp.asarray(rng.randn(4, C_in), jnp.float32)
    y_ref = (x @ W + b - mean) * scale * jax.lax.rsqrt(var + 1e-5) + bias
    Wf, bf = fold_bn_dense(W, b, scale, bias, mean, var)
    np.testing.assert_allclose(np.asarray(x @ Wf + bf), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_msg_scale_sharded_matches_module(rng):
    """event_sharded_msg_scale == SetAbstractionMsg's dense eval scale with
    live BN-folded weights, on a 2-D (data, event) mesh."""
    import flax.linen as nn

    from ev2hands_tpu.model.layers import SetAbstractionMsg
    from ev2hands_tpu.parallel.event_parallel import create_event_mesh

    B, N = 2, 256
    xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    points = jnp.asarray(rng.randn(B, N, 5) * 0.3, jnp.float32)

    kwargs = dict(
        npoint=32, radius_list=(0.2, 0.4), nsample_list=(8, 16),
        mlps=((16, 16, 32), (16, 24, 32)), grouping="dense",
    )
    mod = SetAbstractionMsg(**kwargs)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, xyz, points, False)
    # non-trivial running stats so the BN fold is actually exercised
    variables = jax.tree.map(
        lambda a: a + 0.05 if a.ndim == 1 else a, variables
    )

    ref_xyz, ref_out = mod.apply(variables, xyz, points, False)

    mesh = create_event_mesh(n_event=4, n_data=2)
    mod_sharded = SetAbstractionMsg(**kwargs, event_mesh=mesh)
    got_xyz, got_out = mod_sharded.apply(variables, xyz, points, False)

    np.testing.assert_allclose(np.asarray(got_xyz), np.asarray(ref_xyz))
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-4)


def test_tehnet_event_sharded_full_model(rng):
    """FULL TEHNet forward, event-sharded over the 8-device (2 data x 4
    event) mesh at N=4096 — past the single-chip nominal window — must match
    the unsharded dense forward on every output head."""
    from ev2hands_tpu.config import ModelConfig
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.parallel.event_parallel import create_event_mesh

    N = 4096
    cfg = ModelConfig(n_points=N, fps_deterministic=True,
                      grouping="dense", event_parallel=True)
    net = TEHNet(cfg=cfg)
    events = jnp.asarray(
        np.concatenate([
            rng.rand(2, N, 2) * 2 - 1,             # x, y in [-1, 1]
            np.sort(rng.rand(2, N, 1) * 2 - 1, 1),  # t sorted
            rng.randint(1, 5, (2, N, 2)),            # polarity counts
        ], axis=-1), jnp.float32,
    )
    variables = jax.jit(
        lambda k: net.init({"params": k}, events[:1, :8], train=False)
    )(jax.random.PRNGKey(0))

    ref = net.apply(variables, events, train=False)

    mesh = create_event_mesh(n_event=4, n_data=2)
    net_sharded = TEHNet(cfg=cfg, event_mesh=mesh)
    got = net_sharded.apply(variables, events, train=False)

    np.testing.assert_allclose(
        np.asarray(got["class_logits"]), np.asarray(ref["class_logits"]),
        rtol=1e-4, atol=1e-4,
    )
    for side in ("left", "right"):
        for k in ("global_orient", "hand_pose", "betas", "transl"):
            np.testing.assert_allclose(
                np.asarray(got[side][k]), np.asarray(ref[side][k]),
                rtol=1e-4, atol=1e-4,
                err_msg=f"{side}/{k} diverges under event sharding",
            )


def test_event_sharded_empty_fallback(rng):
    """Centroids with no in-radius point anywhere take point 0's features."""
    B, N, S, C1 = 1, 64, 2, 4
    xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    u = jnp.asarray(rng.randn(B, N, C1), jnp.float32)
    new_xyz = jnp.ones((B, S, 3)) * 100.0  # far from everything
    v = jnp.zeros((B, S, C1))
    eye = jnp.eye(C1)
    zero = jnp.zeros(C1)

    ref = _single_device_reference(xyz, u, new_xyz, v, eye, zero, eye, zero, 0.1, 4)
    got = event_sharded_dense_scale(
        _make_mesh(), xyz, u, new_xyz, v, eye, zero, eye, zero, 0.1, 4
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    assert np.isfinite(np.asarray(got)).all()
