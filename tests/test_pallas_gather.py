"""One-hot MXU gather kernel (ops/pallas_gather.py): interpret-mode
exactness on CPU vs the index_points path it replaces, the permuted-space
ball query's selection parity, and the layer-level wiring."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ev2hands_tpu.ops.pallas_gather import (
    grouped_gather,
    pos_tile_activity,
    split3_bf16,
)
from ev2hands_tpu.ops.pointnet import (
    index_points,
    query_ball_point,
    query_ball_point_permuted,
    square_distance,
)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def test_split3_exact(rng):
    x = jnp.asarray(
        (rng.randn(4, 64, 8) * np.exp(rng.randn(4, 64, 8))).astype(np.float32)
    )
    s3 = split3_bf16(x)
    C = x.shape[-1]
    back = (
        s3[..., :C].astype(jnp.float32)
        + s3[..., C : 2 * C].astype(jnp.float32)
        + s3[..., 2 * C :].astype(jnp.float32)
    )
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_split3_segmented(rng):
    """Wide-C layout: each hi|mid|lo term padded to ``seg`` lanes, re-sum of
    the first C lanes of each segment still exact, padding exactly zero."""
    from ev2hands_tpu.ops.pallas_gather import _seg_width

    C = 150
    seg = _seg_width(C)
    assert seg == 256 and _seg_width(8) == 8 and _seg_width(43) == 128
    x = jnp.asarray(
        (rng.randn(2, 32, C) * np.exp(rng.randn(2, 32, C))).astype(np.float32)
    )
    s3 = split3_bf16(x, seg=seg)
    assert s3.shape[-1] == 3 * seg
    terms = [s3[..., i * seg : i * seg + C].astype(jnp.float32)
             for i in range(3)]
    assert np.array_equal(np.asarray(sum(terms)), np.asarray(x))
    pads = [s3[..., i * seg + C : (i + 1) * seg] for i in range(3)]
    assert all(not np.any(np.asarray(p)) for p in pads)


def test_pos_tile_activity(rng):
    pos = jnp.asarray(rng.randint(0, 256, size=(2, 8, 24)).astype(np.int32))
    act = pos_tile_activity(pos, 64, 256)
    want = np.zeros((2, 8, 4), np.int32)
    p = np.asarray(pos)
    for b in range(2):
        for s in range(8):
            for t in np.unique(p[b, s] // 64):
                want[b, s, t] = 1
    assert np.array_equal(np.asarray(act), want)


@pytest.mark.parametrize("C", [8, 7, 3, 45, 150])
def test_onehot_gather_matches_index_points_interpret(rng, C):
    B, N, S, K, nb = 2, 256, 16, 24, 64
    src = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    # clustered + duplicated indices, like real backfilled ball queries
    base = rng.randint(0, N, size=(B, S, 1))
    idx = np.clip(
        base + rng.randint(-8, 9, size=(B, S, K)), 0, N - 1
    ).astype(np.int32)
    idx[:, :, K // 2 :] = idx[:, :, :1]  # heavy backfill duplicates
    idx = jnp.asarray(idx)

    act = pos_tile_activity(idx, nb, N)
    got = grouped_gather(src, idx, act, nb=nb, interpret=True)
    want = index_points(src, idx)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_onehot_gather_vjp_matches(rng):
    B, N, S, K, nb = 2, 128, 8, 16, 32
    src = jnp.asarray(rng.randn(B, N, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, size=(B, S, K)).astype(np.int32))
    act = pos_tile_activity(idx, nb, N)
    ct = jnp.asarray(rng.randn(B, S, K, 5).astype(np.float32))

    f = functools.partial(
        grouped_gather, idx=idx, act=act, nb=nb, interpret=True
    )
    _, vjp = jax.vjp(lambda s: f(s), src)
    (dgot,) = vjp(ct)
    _, vjp_ref = jax.vjp(lambda s: index_points(s, idx), src)
    (dwant,) = vjp_ref(ct)
    np.testing.assert_allclose(
        np.asarray(dgot), np.asarray(dwant), rtol=0, atol=1e-6
    )


@pytest.mark.parametrize("C", [8, 45])
def test_onehot_scatter_add_matches_xla_interpret(rng, C):
    from ev2hands_tpu.ops.pallas_gather import (
        _gather_transpose,
        _onehot_scatter_add,
    )

    B, N, S, K, nb = 2, 256, 16, 24, 64
    g = jnp.asarray(rng.randn(B, S, K, C).astype(np.float32))
    # clustered + heavily duplicated indices (the backfill pattern): the
    # kernel must accumulate same-row slot cotangents correctly
    base = rng.randint(0, N, size=(B, S, 1))
    idx = np.clip(
        base + rng.randint(-8, 9, size=(B, S, K)), 0, N - 1
    ).astype(np.int32)
    idx[:, :, K // 2 :] = idx[:, :, :1]
    idx = jnp.asarray(idx)
    act = pos_tile_activity(idx, nb, N)

    got = _onehot_scatter_add(g, idx, act, N, nb=nb, interpret=True)
    want = _gather_transpose(g, idx, N)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-5
    )


def test_grouped_gather_pallas_bwd_matches_xla_bwd(rng):
    B, N, S, K, nb = 2, 128, 8, 16, 32
    src = jnp.asarray(rng.randn(B, N, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, size=(B, S, K)).astype(np.int32))
    act = pos_tile_activity(idx, nb, N)
    ct = jnp.asarray(rng.randn(B, S, K, 5).astype(np.float32))

    grads = {}
    for mode in ("xla", "pallas"):
        _, vjp = jax.vjp(
            lambda s: grouped_gather(
                src=s, idx=idx, act=act, nb=nb, bwd=mode, interpret=True
            ),
            src,
        )
        (grads[mode],) = vjp(ct)
    np.testing.assert_allclose(
        np.asarray(grads["pallas"]), np.asarray(grads["xla"]),
        rtol=1e-6, atol=1e-5,
    )


def test_query_ball_point_permuted_selection_parity(rng):
    """Permuted-column ball query picks the SAME multiset in the SAME slot
    order as query_ball_point (the packed score is the original index), and
    returns positions into the permuted axis."""
    B, N, S, r, K = 2, 128, 16, 0.35, 12
    xyz = jnp.asarray(
        np.clip(rng.randn(B, N, 3) * 0.4, -1, 1).astype(np.float32)
    )
    new_xyz = xyz[:, :S, :]  # queries sampled from the cloud (never empty)

    perm = jnp.asarray(
        np.stack([rng.permutation(N) for _ in range(B)]).astype(np.int32)
    )
    xyz_p = jnp.take_along_axis(xyz, perm[..., None], axis=1)

    idx_ref = query_ball_point(r, K, xyz, new_xyz)           # original idx
    pos = query_ball_point_permuted(
        r, K, perm, square_distance(new_xyz, xyz_p)
    )
    # positions -> original indices must reproduce the reference slots
    orig_of_pos = jnp.take_along_axis(
        jnp.broadcast_to(perm[:, None, :], (B, S, N)), pos, axis=-1
    )
    assert np.array_equal(np.asarray(orig_of_pos), np.asarray(idx_ref))
    # and gathering the permuted source equals gathering the original
    feats = jnp.asarray(rng.randn(B, N, 6).astype(np.float32))
    feats_p = jnp.take_along_axis(feats, perm[..., None], axis=1)
    assert np.array_equal(
        np.asarray(index_points(feats_p, pos)),
        np.asarray(index_points(feats, idx_ref)),
    )


@pytest.mark.parametrize("bwd", ["xla", "pallas"])
def test_sa_msg_pallas_gather_grad_parity(rng, monkeypatch, bwd):
    """Parameter gradients through the pgather branch (custom_vjp inside
    the flax module) match the index_points branch."""
    from ev2hands_tpu.model import layers as L
    from ev2hands_tpu.ops import pallas_gather as PG

    B, N, S = 2, 128, 8
    xyz = jnp.asarray(
        np.clip(rng.randn(B, N, 3) * 0.4, -1, 1).astype(np.float32)
    )
    feats = jnp.asarray(rng.randn(B, N, 5).astype(np.float32))

    mod = L.SetAbstractionMsg(
        npoint=S,
        radius_list=(0.3,),
        nsample_list=(12,),
        mlps=((8, 8, 16),),
        grouping="gather",
        pallas_gather_nb=32,
        pallas_gather_bwd=(bwd == "pallas"),
    )
    variables = mod.init(jax.random.PRNGKey(0), xyz, feats, True)

    def loss(params, f):
        (nx, npts), _ = mod.apply(
            {**variables, "params": params}, xyz, f, True,
            mutable=["batch_stats"],
        )
        return jnp.sum(npts**2) + jnp.sum(nx)

    g0 = jax.grad(loss, argnums=(0, 1))(variables["params"], feats)

    monkeypatch.setattr(
        L.SetAbstractionMsg, "_use_pallas_gather", lambda self, n, d: True
    )
    orig = PG.grouped_gather
    monkeypatch.setattr(
        PG, "grouped_gather", functools.partial(orig, interpret=True)
    )
    g1 = jax.grad(loss, argnums=(0, 1))(variables["params"], feats)

    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("D", [5, 45])
def test_sa_msg_pallas_gather_branch_bitwise(rng, monkeypatch, D):
    """SetAbstractionMsg's pgather branch (permuted ball query + one-hot
    kernel in interpret mode) is bitwise-identical to the index_points
    gather branch — outputs AND BatchNorm batch-stat updates. D=45 drives
    the wide-channel path (3*(45+3) > 128 -> 128-lane segment padding),
    the layer-level analogue of sa2's 320-feature source."""
    from ev2hands_tpu.model import layers as L
    from ev2hands_tpu.ops import pallas_gather as PG

    B, N, S = 2, 256, 16
    xyz = jnp.asarray(
        np.clip(rng.randn(B, N, 3) * 0.4, -1, 1).astype(np.float32)
    )
    feats = jnp.asarray(rng.randn(B, N, D).astype(np.float32))

    mod = L.SetAbstractionMsg(
        npoint=S,
        radius_list=(0.2, 0.4),
        nsample_list=(8, 16),
        mlps=((16, 16, 32), (16, 16, 32)),
        grouping="gather",
        pallas_gather_nb=64,
    )
    variables = mod.init(jax.random.PRNGKey(0), xyz, feats, True)

    def run():
        (nx, npts), upd = mod.apply(
            variables, xyz, feats, True, mutable=["batch_stats"]
        )
        return nx, npts, upd

    nx0, np0, upd0 = run()  # gate off on CPU -> index_points path

    monkeypatch.setattr(
        L.SetAbstractionMsg, "_use_pallas_gather", lambda self, n, d: True
    )
    orig = PG.grouped_gather
    monkeypatch.setattr(
        PG, "grouped_gather", functools.partial(orig, interpret=True)
    )
    nx1, np1, upd1 = run()

    assert np.array_equal(np.asarray(nx0), np.asarray(nx1))
    assert np.array_equal(np.asarray(np0), np.asarray(np1))
    for k in upd0["batch_stats"]:
        for leaf in upd0["batch_stats"][k]:
            assert np.array_equal(
                np.asarray(upd0["batch_stats"][k][leaf]),
                np.asarray(upd1["batch_stats"][k][leaf]),
            ), (k, leaf)
