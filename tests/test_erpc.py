"""Device-side ERPC transform tests vs a numpy oracle of the reference
rasterization (scatter-add grids -> nonzero pixels -> normalize)."""

import jax
import jax.numpy as jnp
import numpy as np

from ev2hands_tpu.events.erpc import (
    erpc_batch_transform,
    erpc_window_transform,
    normalize_erpc,
    rasterize_erpc,
)

W, H = 64, 48  # small sensor for tests


def make_window(rng, n=256, n_pix=None):
    xs = rng.randint(0, W, n)
    ys = rng.randint(0, H, n)
    if n_pix is not None:  # force events onto a limited pixel set
        px = rng.randint(0, W, n_pix)
        py = rng.randint(0, H, n_pix)
        sel = rng.randint(0, n_pix, n)
        xs, ys = px[sel], py[sel]
    ts = np.sort(rng.randint(0, 5_000_000, n)).astype(np.float64)  # ns
    ps = rng.randint(0, 2, n)
    labels = rng.randint(0, 3, n)
    ev = np.stack([xs, ys, ts, ps], -1).astype(np.float32)
    return ev, labels.astype(np.int32)


def oracle_rasterize(ev, labels):
    grid_t = np.zeros((H, W))
    grid_p = np.zeros((H, W))
    grid_n = np.zeros((H, W))
    cnt = np.zeros((H, W))
    lab = np.full((H, W), -1)
    x, y, t, p = ev[:, 0].astype(int), ev[:, 1].astype(int), ev[:, 2], ev[:, 3]
    np.add.at(grid_t, (y, x), t)
    np.add.at(grid_p, (y, x), p == 1)
    np.add.at(grid_n, (y, x), p != 1)
    np.add.at(cnt, (y, x), 1)
    for i in range(len(ev)):
        lab[y[i], x[i]] = max(lab[y[i], x[i]], labels[i])
    yi, xi = np.nonzero(cnt)
    t_avg = grid_t[yi, xi] / cnt[yi, xi] * 1e-6
    feats = np.stack([xi, yi, t_avg, grid_p[yi, xi], grid_n[yi, xi]], -1)
    return feats.astype(np.float32), lab[yi, xi].astype(np.int32)


def test_rasterize_matches_oracle(rng):
    ev, labels = make_window(rng, n=256, n_pix=100)
    feats, pix_labels, n_valid = rasterize_erpc(
        jnp.asarray(ev), jnp.asarray(labels), W, H
    )
    ref_feats, ref_labels = oracle_rasterize(ev, labels)

    n = int(n_valid)
    assert n == len(ref_feats)
    got = np.asarray(feats)[:n]
    np.testing.assert_allclose(got, ref_feats, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pix_labels)[:n], ref_labels)
    # padded rows zeroed
    assert np.all(np.asarray(feats)[n:] == 0)


def test_rasterize_row_major_order(rng):
    ev, labels = make_window(rng, n=64)
    feats, _, n_valid = rasterize_erpc(jnp.asarray(ev), jnp.asarray(labels), W, H)
    n = int(n_valid)
    f = np.asarray(feats)[:n]
    pix = f[:, 1] * W + f[:, 0]
    assert np.all(np.diff(pix) > 0)  # strictly ascending row-major ids


def test_normalize_ranges(rng):
    ev, labels = make_window(rng, n=128)
    feats, _, n_valid = rasterize_erpc(jnp.asarray(ev), jnp.asarray(labels), W, H)
    n = int(n_valid)
    normed = np.asarray(normalize_erpc(feats[:n], W, H))
    assert normed[:, 0].min() >= -1 and normed[:, 0].max() <= 1
    assert normed[:, 1].min() >= -1 and normed[:, 1].max() <= 1
    np.testing.assert_allclose(normed[:, 2].min(), -1, atol=1e-5)
    np.testing.assert_allclose(normed[:, 2].max(), 1, atol=1e-5)
    # polarity counts stay raw (reference normalizes only first 3 columns)
    assert normed[:, 3:].max() >= 1


def test_window_transform_fixed_shape(rng):
    ev, labels = make_window(rng, n=256, n_pix=60)
    out = erpc_window_transform(
        jnp.asarray(ev), jnp.asarray(labels), jax.random.PRNGKey(0),
        width=W, height=H, n_out=512, augment=False,
    )
    assert out.events.shape == (512, 5)
    assert out.labels.shape == (512,)
    # all sampled rows must come from the 60 occupied pixels
    xs = np.asarray(out.events[:, 0])
    assert np.isfinite(xs).all()
    assert np.asarray(out.labels).max() <= 2  # no noise class without augment


def test_window_transform_augment_adds_noise_class(rng):
    ev, labels = make_window(rng, n=256)
    # try several keys: the augment gate fires with p=0.5
    hit = False
    for s in range(8):
        out = erpc_window_transform(
            jnp.asarray(ev), jnp.asarray(labels), jax.random.PRNGKey(s),
            width=W, height=H, n_out=512, augment=True,
        )
        if (np.asarray(out.labels) == 3).any():
            hit = True
            break
    assert hit


def test_batch_transform_vmapped(rng):
    evs, labs = zip(*[make_window(rng, n=128) for _ in range(4)])
    out = erpc_batch_transform(
        jnp.asarray(np.stack(evs)), jnp.asarray(np.stack(labs)),
        jax.random.PRNGKey(1), width=W, height=H, n_out=256,
    )
    assert out.events.shape == (4, 256, 5)
    # different windows -> different clouds
    assert not np.allclose(np.asarray(out.events[0]), np.asarray(out.events[1]))


def test_single_pixel_window_no_nan():
    ev = np.tile(np.array([[5, 7, 1000.0, 1]], np.float32), (32, 1))
    labels = np.ones(32, np.int32)
    out = erpc_window_transform(
        jnp.asarray(ev), jnp.asarray(labels), jax.random.PRNGKey(0),
        width=W, height=H, n_out=64,
    )
    assert np.isfinite(np.asarray(out.events)).all()


def test_rasterize_large_window_masked_and_bounded(rng):
    """Real-stream shape: N=4096 padded window with an event_valid mask and
    max_pixels below the distinct-pixel count — the packed sort key must
    stay in int32 range, invalid events must be dropped, and the kept rows
    must be the lowest max_pixels pixel ids in row-major order."""
    N, P = 4096, 512
    xs = rng.randint(0, W, N)
    ys = rng.randint(0, H, N)
    ts = np.sort(rng.randint(0, 2_000, N)).astype(np.float64)  # ms timestamps
    ps = rng.randint(0, 2, N)
    ev = np.stack([xs, ys, ts, ps], -1).astype(np.float32)
    labels = np.zeros(N, np.int32)
    valid = rng.rand(N) > 0.25

    feats, _, n_valid = rasterize_erpc(
        jnp.asarray(ev), jnp.asarray(labels), W, H,
        event_valid=jnp.asarray(valid), time_scale=1.0, max_pixels=P,
    )

    # numpy oracle on the valid events only
    evv = ev[valid]
    grid_t = np.zeros((H, W))
    grid_p = np.zeros((H, W))
    grid_n = np.zeros((H, W))
    cnt = np.zeros((H, W))
    x, y = evv[:, 0].astype(int), evv[:, 1].astype(int)
    np.add.at(grid_t, (y, x), evv[:, 2])
    np.add.at(grid_p, (y, x), evv[:, 3] == 1)
    np.add.at(grid_n, (y, x), evv[:, 3] != 1)
    np.add.at(cnt, (y, x), 1)
    yi, xi = np.nonzero(cnt)  # row-major ascending
    keep = slice(0, P)
    ref = np.stack([
        xi, yi, grid_t[yi, xi] / cnt[yi, xi],
        grid_p[yi, xi], grid_n[yi, xi],
    ], -1)[keep]

    n = int(n_valid)
    assert n == min(len(np.nonzero(cnt)[0]), P)
    got = np.asarray(feats)[:n]
    np.testing.assert_allclose(got, ref[:n], rtol=1e-6, atol=1e-4)
