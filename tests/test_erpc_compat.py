"""Pre-rasterized ERPC format compatibility: datasets written in the
reference's ``main_erpc.py`` part layout are consumed identically to the
on-the-fly device transform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ev2hands_tpu.datagen.erpc_writer import (
    PreRasterizedErpcReader,
    rasterize_frame_erpc,
    write_erpc_parts,
)
from ev2hands_tpu.events.erpc import (
    erpc_preraster_batch_transform,
    rasterize_erpc,
)

W, H = 64, 48


def make_frame(rng, n=400):
    xs = rng.randint(0, W, n)
    ys = rng.randint(0, H, n)
    ts = np.sort(rng.randint(0, 1_000_000, n)).astype(np.float64)  # ns
    ps = rng.randint(0, 2, n)
    labels = rng.randint(0, 3, n)
    return {
        "events": np.stack([xs, ys, ts, ps], -1).astype(np.float64),
        "event_labels": labels.astype(np.int64),
        "camera_hand_info": {
            "left": {
                "global_orient": np.zeros(3, np.float32),
                "hand_pose": np.zeros(45, np.float32),
                "shape": np.zeros(10, np.float32),
                "trans": np.zeros(3, np.float32),
            },
            "right": {
                "global_orient": np.zeros(3, np.float32),
                "hand_pose": np.zeros(45, np.float32),
                "shape": np.zeros(10, np.float32),
                "trans": np.ones(3, np.float32),
            },
        },
    }


def test_preraster_rows_match_device_rasterizer(rng):
    """The host pre-rasterizer (reference recipe, main_erpc.py:84-109) and
    the on-device rasterizer agree row for row (before any sampling)."""
    frame = make_frame(rng)
    rows, row_labels = rasterize_frame_erpc(
        frame["events"], frame["event_labels"], W, H, n_events=10_000
    )
    feats, pix_labels, n_valid = rasterize_erpc(
        jnp.asarray(frame["events"], jnp.float32),
        jnp.asarray(frame["event_labels"], jnp.int32),
        W, H,
    )
    n = int(n_valid)
    assert n == len(rows)
    np.testing.assert_allclose(np.asarray(feats)[:n], rows, rtol=1e-5, atol=1e-4)
    # device labels use max-wins on collisions; the host writer uses
    # last-writer-wins like the reference's seg-map lookup — compare only
    # unambiguous pixels (single label per pixel here by construction of
    # random labels is not guaranteed, so just check the label sets align
    # in count)
    assert len(row_labels) == n


def test_preraster_downsample_cap(rng):
    frame = make_frame(rng, n=4000)
    rows, labels = rasterize_frame_erpc(
        frame["events"], frame["event_labels"], W, H, n_events=128,
        rng=np.random.RandomState(0),
    )
    assert len(rows) == 128 and len(labels) == 128


def test_write_read_roundtrip(tmp_path, rng):
    frames = [make_frame(rng) for _ in range(5)]
    parts = write_erpc_parts(
        iter(frames), str(tmp_path), mode="train", width=W, height=H,
        frames_per_part=2,
    )
    assert len(parts) == 3  # 2 + 2 + 1

    # the cache keys match the reference's byte layout (main_erpc.py:147-156)
    import pickle

    with open(parts[0], "rb") as f:
        cache = pickle.load(f)
    assert b"events-%09d" % 0 in cache
    assert b"event_labels-%09d" % 0 in cache
    assert b"camera_hand_info-%09d" % 0 in cache
    assert cache[b"events-%09d" % 0].shape[1] == 5

    reader = PreRasterizedErpcReader(parts, capacity=512)
    assert len(reader) == 5
    batch = next(reader.batches(4, shuffle=False))
    assert batch["feats"].shape == (4, 512, 5)
    assert batch["labels"].shape == (4, 512)
    assert batch["left"]["hand_pose"].shape == (4, 45)

    out = erpc_preraster_batch_transform(
        jnp.asarray(batch["feats"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["n_valid"]), jax.random.PRNGKey(0),
        width=W, height=H, n_out=256,
    )
    e = np.asarray(out.events)
    assert e.shape == (4, 256, 5)
    assert np.isfinite(e).all()
    assert e[..., 0].min() >= -1 and e[..., 0].max() <= 1
    # every sampled row is a real pixel row: total polarity count >= 1
    assert (e[..., 3] + e[..., 4]).min() >= 1


def test_preraster_transform_equals_raw_transform_stats(rng):
    """Pre-rasterized and raw paths produce statistically identical clouds
    for the same frame (same pixel support and value ranges)."""
    from ev2hands_tpu.events.erpc import erpc_window_transform

    frame = make_frame(rng)
    raw = erpc_window_transform(
        jnp.asarray(frame["events"], jnp.float32),
        jnp.asarray(frame["event_labels"], jnp.int32),
        jax.random.PRNGKey(1), width=W, height=H, n_out=256,
    )

    rows, row_labels = rasterize_frame_erpc(
        frame["events"], frame["event_labels"], W, H, n_events=10_000
    )
    cap = 1024
    feats = np.zeros((cap, 5), np.float32)
    labs = np.zeros((cap,), np.int32)
    feats[: len(rows)] = rows
    labs[: len(rows)] = row_labels
    pre = erpc_preraster_batch_transform(
        jnp.asarray(feats)[None], jnp.asarray(labs)[None],
        jnp.asarray([len(rows)], jnp.int32), jax.random.PRNGKey(1),
        width=W, height=H, n_out=256,
    )
    a, b = np.asarray(raw.events), np.asarray(pre.events)[0]

    # every sampled pre-rasterized row denormalizes to a real pixel row
    def denorm(e):
        x = np.round((e[:, 0] + 1) / 2 * W).astype(int)
        y = np.round((e[:, 1] + 1) / 2 * H).astype(int)
        return {(xi, yi, pi, ni) for xi, yi, pi, ni in
                zip(x, y, e[:, 3].astype(int), e[:, 4].astype(int))}

    support = {(int(r[0]), int(r[1]), int(r[3]), int(r[4])) for r in rows}
    assert denorm(b) <= support
    assert denorm(a) <= support
    # similar sampling statistics between the two paths
    assert abs(a[:, 3].mean() - b[:, 3].mean()) < 1.5
