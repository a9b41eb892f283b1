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


def test_event_sharded_fps_matches_unsharded(rng):
    """event_sharded_fps == farthest_point_sample exactly (greedy max-min,
    first-max tie-breaking), deterministic and random-key starts, on the
    (2 data x 4 event) mesh."""
    from ev2hands_tpu.ops.pointnet import farthest_point_sample
    from ev2hands_tpu.parallel.event_parallel import (
        create_event_mesh,
        event_sharded_fps,
    )

    B, N, S = 2, 256, 48
    xyz = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    mesh = create_event_mesh(n_event=4, n_data=2)

    ref = farthest_point_sample(xyz, S)
    got = event_sharded_fps(mesh, xyz, S)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    key = jax.random.PRNGKey(5)
    ref = farthest_point_sample(xyz, S, key=key)
    got = event_sharded_fps(mesh, xyz, S, key=key)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_event_train_scale_matches_dense_train(rng):
    """The event-sharded TRAINING scale (weighted BN stats psum'd across
    shards, all_gather max/min pooling) == the single-device dense_train
    scale: outputs, updated running stats, and parameter gradients."""
    import jax.flatten_util

    from ev2hands_tpu.model.layers import SetAbstractionMsg
    from ev2hands_tpu.parallel.event_parallel import create_event_mesh

    B, N = 2, 256
    xyz = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    points = jnp.asarray(rng.randn(B, N, 5) * 0.3, jnp.float32)
    kwargs = dict(
        npoint=32, radius_list=(0.2, 0.4), nsample_list=(8, 16),
        mlps=((16, 16, 32), (16, 24, 32)), grouping="dense",
        dense_train=True, pallas_grouping=False,
    )
    mod = SetAbstractionMsg(**kwargs)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, xyz, points, True)

    mesh = create_event_mesh(n_event=4, n_data=2)
    res = {}
    for name, m in (("single", SetAbstractionMsg(**kwargs)),
                    ("sharded", SetAbstractionMsg(**kwargs, event_mesh=mesh))):
        def fwd(params):
            (nx, out), upd = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xyz, points, True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2), (out, upd["batch_stats"])

        (loss, (out, st)), g = jax.value_and_grad(fwd, has_aux=True)(
            variables["params"])
        res[name] = (out, st, g)

    np.testing.assert_allclose(np.asarray(res["single"][0]),
                               np.asarray(res["sharded"][0]), atol=1e-4)
    for (p1, l1), (p2, l2) in zip(
        jax.tree.leaves_with_path(res["single"][1]),
        jax.tree.leaves_with_path(res["sharded"][1]),
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-4, atol=1e-5, err_msg=str(p1))
    f1, _ = jax.flatten_util.ravel_pytree(res["single"][2])
    f2, _ = jax.flatten_util.ravel_pytree(res["sharded"][2])
    rel = np.linalg.norm(np.asarray(f1) - np.asarray(f2)) / (
        np.linalg.norm(np.asarray(f1)) + 1e-12)
    assert rel < 1e-3, rel


def test_tehnet_event_sharded_train_step(rng):
    """FULL TEHNet training step (forward + BN updates + grads) with the
    event axis sharded over the (2 data x 4 event) mesh == unsharded
    dense_train, compared in float64 (f32 accumulation noise amplifies
    through the stack; see test_dense_train_full_model_matches_gather)."""
    import jax.flatten_util

    from ev2hands_tpu.config import ModelConfig
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.parallel.event_parallel import create_event_mesh

    jax.config.update("jax_enable_x64", True)
    try:
        N = 256  # keeps the 8-way sharded f64 run ~5 min; parity is
        # N-independent (the N=8192 execution lives in
        # scripts/event_train_n8192.py)
        x = jax.random.normal(jax.random.PRNGKey(7), (2, N, 5),
                              dtype=jnp.float64)
        mesh = create_event_mesh(n_event=4, n_data=2)
        res = {}
        for name, emesh in (("single", None), ("sharded", mesh)):
            cfg = ModelConfig(n_points=N, fps_deterministic=True,
                              grouping="dense", dense_train=True,
                              dense_chunk=512, regressor_dense_chunk=512,
                              event_parallel=emesh is not None,
                              pallas_grouping=False)
            net = TEHNet(cfg=cfg, event_mesh=emesh)
            variables = net.init({"params": jax.random.PRNGKey(0)}, x,
                                 train=False)
            variables = jax.tree.map(
                lambda a: a.astype(jnp.float64)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)

            def fwd(params):
                out, upd = net.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(11),
                          "fps": jax.random.PRNGKey(12)},
                    mutable=["batch_stats"],
                )
                loss = (jnp.sum(out["class_logits"] ** 2)
                        + sum(jnp.sum(out[s][k] ** 2)
                              for s in ("left", "right")
                              for k in ("global_orient", "hand_pose",
                                        "betas", "transl")))
                return loss, upd["batch_stats"]

            (loss, st), g = jax.value_and_grad(fwd, has_aux=True)(
                variables["params"])
            res[name] = (float(loss), st, g)

        np.testing.assert_allclose(res["single"][0], res["sharded"][0],
                                   rtol=1e-9)
        for (p1, l1), (p2, l2) in zip(
            jax.tree.leaves_with_path(res["single"][1]),
            jax.tree.leaves_with_path(res["sharded"][1]),
        ):
            assert p1 == p2
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=1e-8, atol=1e-10, err_msg=str(p1))
        f1, _ = jax.flatten_util.ravel_pytree(res["single"][2])
        f2, _ = jax.flatten_util.ravel_pytree(res["sharded"][2])
        rel = np.linalg.norm(np.asarray(f1) - np.asarray(f2)) / (
            np.linalg.norm(np.asarray(f1)) + 1e-30)
        assert rel < 1e-8, rel
    finally:
        jax.config.update("jax_enable_x64", False)
