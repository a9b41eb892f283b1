"""Device-side ERPC event-window transform.

The reference computes this per-sample on the host inside DataLoader worker
processes with ``np.add.at`` + ``np.nonzero`` (``dataset/erpc.py:169-298``).
Here the whole transform — rasterize, augment, resample, normalize — is one
fixed-shape jitted (and vmapped/batched) XLA program running on-device, which
is the BASELINE.json north star for the input pipeline.

Pipeline (semantics matched to the reference unless noted):
  1. scatter-add raw events [N, 4] = (x, y, t_ns, p) into per-pixel
     accumulators: sum(t), #positive, #negative, count (``erpc.py:183-187``).
  2. Extract nonzero pixels in row-major order as the 5-feature ERPC cloud
     (x, y, t_avg_ms, #pos, #neg) (``erpc.py:189-195``). Dynamic "number of
     nonzero pixels" is laundered into a static bound: the window holds at
     most N events, so at most N pixels are nonzero; invalid slots are masked.
  3. Optional augmentation: append ``N//32`` uniform noise pixels labeled
     class 3 (``dataset/augmentations.py:38-54``). NOTE: the reference's
     polarity-corruption lines write into a fancy-indexing *copy*
     (``events[augment][:, -1] = ...``) and are therefore no-ops; we
     reproduce the effective behavior (noise append only) and offer the
     intended corruption behind ``corrupt_polarity=True``.
  4. Uniform with-replacement resample to exactly ``n_out`` rows
     (``erpc.py:212-218``; the reference's output row order is random —
     sampling happens after the time sort, destroying it).
  5. Normalize x, y to [-1, 1] by sensor size and t by per-window min/max
     (``erpc.py:23-37``); polarity counts stay raw, exactly like the
     reference (``pc_normalize`` is applied to the first 3 columns only).

Per-pixel labels: the reference keeps the *raw event* label array and indexes
it with pixel-row indices (``erpc.py:198,208,216``), silently misaligning
labels with pixels. We instead derive the per-pixel label as the max event
label at that pixel (noise=3 > right=2 > left=1 > bg=0) — a documented
correctness fix, not a port of the bug.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ErpcWindow(NamedTuple):
    events: jax.Array  # [n_out, 5] normalized ERPC cloud
    labels: jax.Array  # [n_out] int32 per-event class labels


def rasterize_erpc(
    events: jax.Array,   # [N, 4] float32: x, y, t, p (1 / not-1)
    labels: jax.Array,   # [N] int32
    width: int,
    height: int,
    event_valid: jax.Array = None,  # [N] bool — mask for padded events
    time_scale: float = 1e-6,       # ns -> ms for synthetic; 1.0 for real ms
    max_pixels: int = None,         # static output row bound (default N)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Accumulate a raw event window into the per-pixel ERPC representation.

    Returns (feats [P, 5], pixel_labels [P], n_valid scalar int32): up to
    P = max_pixels nonzero pixels in row-major (y, x) order, padded with
    zeros. Padded/invalid events are routed to a dummy pixel and dropped.

    Implementation: the window holds N events, so at most N pixels are ever
    occupied — all work is kept O(N log N) by sorting the events by pixel id
    and aggregating pixel *runs* with sorted ``segment_sum``. (An earlier
    formulation scattered into the full width*height grid and ``top_k``'d the
    ~90k pixel scores; the grid work dominated the whole ERPC transform.)
    """
    N = events.shape[0]
    P = max_pixels or N
    num_pixels = width * height

    x = events[:, 0].astype(jnp.int32)
    y = events[:, 1].astype(jnp.int32)
    t = events[:, 2]
    p = events[:, 3]
    pix = y * width + x  # row-major pixel id
    if event_valid is not None:
        pix = jnp.where(event_valid, pix, num_pixels)  # dummy bucket, sorts last

    # Packed single-key sort + one payload gather: pix rides the high bits,
    # the event index the low bits (ties break by index == stable order). A
    # multi-operand lax.sort carrying the payloads measured ~3.5x slower on
    # TPU (7.0 vs 2.0 ms/batch at B=32, honest key-perturbed timing).
    shift = 1
    while shift < N:
        shift *= 2
    assert (num_pixels + 1) * shift < 2**31, (num_pixels, N)
    packed = pix * shift + jax.lax.iota(jnp.int32, N)
    spacked = jax.lax.sort(packed)
    perm = spacked & (shift - 1)
    pix_s = spacked // shift

    payload = jnp.stack(
        [
            t,
            (p == 1).astype(jnp.float32),
            (p != 1).astype(jnp.float32),
            labels.astype(jnp.float32),  # labels are tiny ints — exact in f32
        ],
        axis=-1,
    )[perm]
    t_s, pos_s, neg_s = payload[:, 0], payload[:, 1], payload[:, 2]
    lab_s = payload[:, 3].astype(jnp.int32)

    # Run boundaries -> dense segment ids in ascending pixel-id order; ids
    # beyond P (possible only when max_pixels < #distinct pixels) are dropped
    # by segment_sum, keeping the first P pixels in row-major order exactly
    # like the reference's np.nonzero slice.
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), pix_s[1:] != pix_s[:-1]]
    )
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # [N] in [0, N)

    seg = partial(
        jax.ops.segment_sum, segment_ids=seg_id, num_segments=P,
        indices_are_sorted=True,
    )
    t_sum = seg(t_s)
    pos_sum = seg(pos_s)
    neg_sum = seg(neg_s)
    cnt = seg(jnp.ones_like(t_s))
    lab = jax.ops.segment_max(
        lab_s, seg_id, num_segments=P, indices_are_sorted=True
    )
    pid = jax.ops.segment_max(
        pix_s, seg_id, num_segments=P, indices_are_sorted=True
    )

    valid = (cnt > 0) & (pid < num_pixels)
    pid_safe = jnp.clip(pid, 0, num_pixels - 1)
    t_avg_ms = (t_sum / jnp.maximum(cnt, 1.0)) * time_scale
    feats = jnp.stack(
        [
            (pid_safe % width).astype(jnp.float32),
            (pid_safe // width).astype(jnp.float32),
            t_avg_ms,
            pos_sum,
            neg_sum,
        ],
        axis=-1,
    )
    feats = jnp.where(valid[:, None], feats, 0.0)
    pixel_labels = jnp.where(valid, lab, 0).astype(jnp.int32)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return feats, pixel_labels, n_valid


def append_noise(
    feats: jax.Array,      # [P, 5]
    labels: jax.Array,     # [P]
    n_valid: jax.Array,
    key: jax.Array,
    width: int,
    height: int,
    n_noise: int,
    active: jax.Array,     # scalar bool: whether augmentation fires
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Append ``n_noise`` uniform noise rows labeled class 3
    (``augmentations.py:40-54``): random pixel, t of a random existing row
    plus U[0,1)*1e3, polarity counts randint(0,8) with a +1 on one side."""
    kx, ky, kt, kr, kp, kn_pe, kn_ne = jax.random.split(key, 7)
    xs = jax.random.randint(kx, (n_noise,), 0, width).astype(jnp.float32)
    ys = jax.random.randint(ky, (n_noise,), 0, height).astype(jnp.float32)
    src = jax.random.randint(kr, (n_noise,), 0, jnp.maximum(n_valid, 1))
    ts = feats[src, 2] + jax.random.uniform(kt, (n_noise,)) * 1e3
    ps = jax.random.bernoulli(kp, 0.5, (n_noise,))
    # independent draws for the two polarity counts, like the reference's two
    # separate np.random.randint calls (augmentations.py:51-52)
    n_pe = jax.random.randint(kn_pe, (n_noise,), 0, 8) + ps.astype(jnp.int32)
    n_ne = jax.random.randint(kn_ne, (n_noise,), 0, 8) + (~ps).astype(jnp.int32)
    noise = jnp.stack(
        [xs, ys, ts, n_pe.astype(jnp.float32), n_ne.astype(jnp.float32)], axis=-1
    )

    P = feats.shape[0]
    out_feats = jnp.concatenate([feats, jnp.where(active, noise, 0.0)], axis=0)
    out_labels = jnp.concatenate(
        [labels, jnp.where(active, 3, 0) * jnp.ones((n_noise,), jnp.int32)], axis=0
    )
    # Noise rows sit at fixed positions [P, P+n_noise); to keep valid rows
    # contiguous is unnecessary — sampling indexes valid slots explicitly.
    noise_count = jnp.where(active, n_noise, 0)
    # Move noise into the contiguous valid region via index arithmetic at
    # sample time; here we just record the layout.
    del P
    return out_feats, out_labels, noise_count


def sample_fixed(
    feats: jax.Array,       # [P, 5] rows; valid rows are [0, n_valid) and
    labels: jax.Array,      # noise rows [base, base + n_noise)
    n_valid: jax.Array,
    noise_base: int,
    n_noise: jax.Array,
    key: jax.Array,
    n_out: int,
) -> Tuple[jax.Array, jax.Array]:
    """Uniform with-replacement resample to ``n_out`` rows over the union of
    valid pixel rows and active noise rows (``erpc.py:213-216``)."""
    total = n_valid + n_noise
    r = jax.random.randint(key, (n_out,), 0, jnp.maximum(total, 1))
    idx = jnp.where(r < n_valid, r, noise_base + (r - n_valid))
    return feats[idx], labels[idx]


def normalize_erpc(feats: jax.Array, width: int, height: int) -> jax.Array:
    """x,y -> [-1,1] by sensor size; t -> [-1,1] by window min/max; polarity
    counts untouched (``erpc.py:23-37`` applied to the first 3 columns)."""
    x = 2.0 * (feats[:, 0] / width) - 1.0
    y = 2.0 * (feats[:, 1] / height) - 1.0
    t = feats[:, 2]
    t_min, t_max = jnp.min(t), jnp.max(t)
    t = 2.0 * (t - t_min) / jnp.maximum(t_max - t_min, 1e-9) - 1.0
    return jnp.stack([x, y, t, feats[:, 3], feats[:, 4]], axis=-1)


@partial(
    jax.jit,
    static_argnames=("width", "height", "n_out", "augment", "time_scale", "max_pixels"),
)
def erpc_window_transform(
    events: jax.Array,   # [N, 4] raw window: x, y, t, p
    labels: jax.Array,   # [N] int32
    key: jax.Array,
    width: int = 346,
    height: int = 260,
    n_out: int = 2048,
    augment: bool = False,
    event_valid: jax.Array = None,
    time_scale: float = 1e-6,
    max_pixels: int = None,
) -> ErpcWindow:
    """Full raw-window -> normalized ERPC cloud transform (single window)."""
    k_gate, k_noise, k_sample = jax.random.split(key, 3)
    feats, pix_labels, n_valid = rasterize_erpc(
        events, labels, width, height,
        event_valid=event_valid, time_scale=time_scale, max_pixels=max_pixels,
    )

    P = feats.shape[0]
    n_noise = n_out // 32
    if augment:
        active = jax.random.bernoulli(k_gate, 0.5)
        feats, pix_labels, noise_count = append_noise(
            feats, pix_labels, n_valid, k_noise, width, height, n_noise, active
        )
    else:
        feats = jnp.concatenate([feats, jnp.zeros((n_noise, 5), feats.dtype)], 0)
        pix_labels = jnp.concatenate([pix_labels, jnp.zeros((n_noise,), jnp.int32)], 0)
        noise_count = jnp.zeros((), jnp.int32)

    sampled, sampled_labels = sample_fixed(
        feats, pix_labels, n_valid, P, noise_count, k_sample, n_out
    )
    return ErpcWindow(
        events=normalize_erpc(sampled, width, height), labels=sampled_labels
    )


def erpc_batch_transform(
    events: jax.Array,  # [B, N, 4]
    labels: jax.Array,  # [B, N]
    key: jax.Array,
    width: int = 346,
    height: int = 260,
    n_out: int = 2048,
    augment: bool = False,
) -> ErpcWindow:
    """Batched transform: one key per window, vmapped."""
    keys = jax.random.split(key, events.shape[0])
    fn = lambda e, l, k: erpc_window_transform(
        e, l, k, width=width, height=height, n_out=n_out, augment=augment
    )
    return jax.vmap(fn)(events, labels, keys)


@partial(jax.jit, static_argnames=("width", "height", "n_out", "augment"))
def erpc_preraster_window_transform(
    feats: jax.Array,    # [P, 5] pre-rasterized ERPC rows (x, y, t_ms, #pos, #neg)
    labels: jax.Array,   # [P] int32 per-row class labels
    n_valid: jax.Array,  # scalar: number of real rows (rest is padding)
    key: jax.Array,
    width: int = 346,
    height: int = 260,
    n_out: int = 2048,
    augment: bool = False,
) -> ErpcWindow:
    """Transform for datasets already stored in the reference's pre-rasterized
    ERPC format (``HandSimulator/main_erpc.py:84-109``): the rasterization
    stage is skipped; noise augmentation, fixed-size resample, and
    normalization run exactly as in :func:`erpc_window_transform`."""
    k_gate, k_noise, k_sample = jax.random.split(key, 3)
    P = feats.shape[0]
    n_noise = n_out // 32
    if augment:
        active = jax.random.bernoulli(k_gate, 0.5)
        feats, labels, noise_count = append_noise(
            feats, labels, n_valid, k_noise, width, height, n_noise, active
        )
    else:
        feats = jnp.concatenate([feats, jnp.zeros((n_noise, 5), feats.dtype)], 0)
        labels = jnp.concatenate([labels, jnp.zeros((n_noise,), jnp.int32)], 0)
        noise_count = jnp.zeros((), jnp.int32)
    sampled, sampled_labels = sample_fixed(
        feats, labels, n_valid, P, noise_count, k_sample, n_out
    )
    return ErpcWindow(
        events=normalize_erpc(sampled, width, height), labels=sampled_labels
    )


def erpc_preraster_batch_transform(
    feats: jax.Array,    # [B, P, 5]
    labels: jax.Array,   # [B, P]
    n_valid: jax.Array,  # [B]
    key: jax.Array,
    width: int = 346,
    height: int = 260,
    n_out: int = 2048,
    augment: bool = False,
) -> ErpcWindow:
    """Batched pre-rasterized transform (one key per frame)."""
    keys = jax.random.split(key, feats.shape[0])
    fn = lambda f, l, n, k: erpc_preraster_window_transform(
        f, l, n, k, width=width, height=height, n_out=n_out, augment=augment
    )
    return jax.vmap(fn)(feats, labels, n_valid, keys)


@partial(jax.jit, static_argnames=("width", "height", "n_out", "augment"))
def raw_window_transform(
    events: jax.Array,   # [N, 4] raw window: x, y, t, p
    labels: jax.Array,   # [N] int32
    key: jax.Array,
    width: int = 346,
    height: int = 260,
    n_out: int = 2048,
    augment: bool = False,
) -> ErpcWindow:
    """Non-ERPC (raw / LNES-style) window transform: the model-input variant
    selected by ``ModelConfig.erpc=False`` (the reference's 4-column path,
    ``augmentations.py:56-61``; arch switch ``TEHNet.py:122``).

    No rasterization: resample the raw (x, y, t, p) events to ``n_out``,
    optionally append N/32 noise events labeled class 3, normalize x,y and
    min/max-normalize t; polarity stays raw. Output is [n_out, 4].
    """
    N = events.shape[0]
    k_gate, k_noise, k_sample = jax.random.split(key, 3)
    n_noise = n_out // 32

    if augment:
        active = jax.random.bernoulli(k_gate, 0.5)
        kx, ky, kt, kr, kp = jax.random.split(k_noise, 5)
        xs = jax.random.randint(kx, (n_noise,), 0, width).astype(jnp.float32)
        ys = jax.random.randint(ky, (n_noise,), 0, height).astype(jnp.float32)
        src = jax.random.randint(kr, (n_noise,), 0, N)
        ts = events[src, 2] + jax.random.uniform(kt, (n_noise,)) * 1e3
        ps = jax.random.bernoulli(kp, 0.5, (n_noise,)).astype(jnp.float32)
        noise = jnp.stack([xs, ys, ts, ps], -1)
        buf = jnp.concatenate([events, jnp.where(active, noise, 0.0)], 0)
        buf_labels = jnp.concatenate(
            [labels, jnp.where(active, 3, 0) * jnp.ones((n_noise,), jnp.int32)], 0
        )
        total = N + jnp.where(active, n_noise, 0)
    else:
        buf, buf_labels, total = events, labels, jnp.asarray(N)

    idx = jax.random.randint(k_sample, (n_out,), 0, total)
    sampled = buf[idx]
    sampled_labels = buf_labels[idx]

    x = 2.0 * (sampled[:, 0] / width) - 1.0
    y = 2.0 * (sampled[:, 1] / height) - 1.0
    t = sampled[:, 2]
    t_min, t_max = jnp.min(t), jnp.max(t)
    t = 2.0 * (t - t_min) / jnp.maximum(t_max - t_min, 1e-9) - 1.0
    out = jnp.stack([x, y, t, sampled[:, 3]], -1)
    return ErpcWindow(events=out, labels=sampled_labels)


def erpc_real_batch_transform(
    events: jax.Array,       # [B, N, 4] variable-length windows, padded
    event_valid: jax.Array,  # [B, N] bool
    key: jax.Array,
    width: int = 346,
    height: int = 260,
    n_out: int = 2048,
    max_pixels: int = None,
) -> ErpcWindow:
    """Real-data batched transform: masked variable-length windows with
    millisecond timestamps, no labels, no noise augmentation
    (``dataset/ev2hands_r.py:110-133``, ``evaluation_stream.py:187-214``).
    ``max_pixels`` bounds the nonzero-pixel extraction (default n_out*2)."""
    B, N, _ = events.shape
    mp = max_pixels or min(N, max(n_out * 2, 2048))
    keys = jax.random.split(key, B)
    labels = jnp.zeros((B, N), jnp.int32)

    fn = lambda e, l, v, k: erpc_window_transform(
        e, l, k, width=width, height=height, n_out=n_out, augment=False,
        event_valid=v, time_scale=1.0, max_pixels=mp,
    )
    return jax.vmap(fn)(events, labels, event_valid, keys)
