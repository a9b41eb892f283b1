"""ESIM-style event-camera simulation as a fixed-shape JAX kernel.

TPU-native replacement for both reference event simulators (SURVEY.md §2.4
N3/N4): the CUDA ``esim_torch.EventSimulator_torch`` wrapped by ``ColorESIM``
(``color_event_simulator.py:197-247``) and the numba-CUDA per-pixel
threshold-crossing kernel (``:29-66``).

Key observation that removes the per-pixel while-loop entirely: between two
frames the log intensity is linear in time, so the threshold crossings of one
pixel are *evenly spaced* — the full event set of a frame pair is described
per pixel by 4 numbers: (count, polarity, t_first, t_step). The device kernel
emits this compact O(H*W) representation; the host expands it to an event
list (the reference likewise compacts on host, ``:81-103``). Event counts per
pixel per frame are capped at a static bound like the reference's 25
(``:34``), made configurable via ``EsimConfig.max_events_per_pixel``.

Color front-end identical to the reference: RGGB Bayer mosaic, gamma 2.2,
log(I + 1e-4) (``color_event_simulator.py:152-161,176-180``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bayer_mask(height: int, width: int) -> np.ndarray:
    """RGGB color filter array, [H, W, 3] one-hot (``:154-160``)."""
    m = np.zeros((height, width, 3), np.float32)
    m[0::2, 0::2, 0] = 1  # R
    m[0::2, 1::2, 1] = 1  # G
    m[1::2, 0::2, 1] = 1  # G
    m[1::2, 1::2, 2] = 1  # B
    return m


def log_intensity(rgb: jax.Array, mask: jax.Array) -> jax.Array:
    """uint8 RGB [H, W, 3] -> mosaiced log intensity [H, W]."""
    linear = (rgb.astype(jnp.float32) / 255.0) ** 2.2
    mono = jnp.sum(linear * mask, axis=-1)
    return jnp.log(mono + 1e-4)


class EsimState(NamedTuple):
    ref: jax.Array         # [H, W] log-intensity reference level
    last_log: jax.Array    # [H, W] previous frame's log intensity
    last_t_ns: jax.Array   # scalar int64-ish float: previous frame time
    initialized: jax.Array  # scalar bool
    last_event_t: jax.Array  # [H, W] timestamp of last EMITTED event (refractory)


class CompactEvents(NamedTuple):
    """Per-pixel run-length event representation for one frame pair."""

    count: jax.Array     # [H, W] int32 number of events
    polarity: jax.Array  # [H, W] int32 +1 / -1
    t_first: jax.Array   # [H, W] float64-ish float32 ns of first event
    t_step: jax.Array    # [H, W] float32 ns between successive events


def esim_init(height: int, width: int, background: float | None = None) -> EsimState:
    """Fresh state. With ``background`` set, the reference level starts at
    log(bg^2.2 + 0.01) like the reference's numba variant (``:150-152``);
    otherwise the first frame initializes it (esim_torch behavior)."""
    if background is not None:
        ref0 = jnp.full((height, width), np.log(background**2.2 + 0.01), jnp.float32)
        init = jnp.asarray(True)
    else:
        ref0 = jnp.zeros((height, width), jnp.float32)
        init = jnp.asarray(False)
    return EsimState(
        ref=ref0,
        last_log=ref0,
        last_t_ns=jnp.zeros((), jnp.float32),
        initialized=init,
        # Far in the past so the first crossing is never refractory-suppressed
        # (esim_torch inits last_event_t to 0 with timestamps starting at 0 and
        # admits the first event unconditionally; -inf-ish gives the same).
        last_event_t=jnp.full((height, width), -1e30, jnp.float32),
    )


def esim_step(
    state: EsimState,
    log_frame: jax.Array,  # [H, W]
    t_ns: jax.Array,       # scalar frame timestamp (ns)
    pos_threshold: float = 0.4,
    neg_threshold: float = 0.4,
    max_events_per_pixel: int = 25,
    refractory_period_ns: float = 0.0,
) -> Tuple[EsimState, CompactEvents]:
    """One frame of ESIM integration. Returns the new state and the compact
    events for the (previous frame -> this frame) interval; the first frame
    of an uninitialized state produces zero events.

    ``refractory_period_ns`` reproduces esim_torch's per-pixel dead time
    (``EventSimulator_torch(refractory_period_ns=...)``, constructed with 0 at
    ``color_event_simulator.py:197-200``): after an event is emitted at pixel
    time ``t``, crossings earlier than ``t + r`` are suppressed — the
    reference level still integrates every crossing, only the *emission* is
    dropped. Because crossings within one frame pair are evenly spaced, the
    surviving subset is itself evenly spaced (first index ``k0``, stride
    ``ceil(r / t_step)``), so the compact representation is closed under
    refractory filtering. The last emitted timestamp is carried across frames
    in ``EsimState.last_event_t``. ``r == 0`` is a static identity (the
    reference's production setting)."""
    delta = log_frame - state.ref
    rising = delta >= 0
    th = jnp.where(rising, pos_threshold, neg_threshold)
    n = jnp.floor(jnp.abs(delta) / th).astype(jnp.int32)
    n = jnp.minimum(n, max_events_per_pixel)
    n = jnp.where(state.initialized, n, 0)

    # Linear interpolation between the previous and current frame:
    # level_k = ref + k*th*sign crosses at
    # t_k = t_prev + (t - t_prev) * (level_k - last_log) / (frame - last_log)
    denom = log_frame - state.last_log
    safe_denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    dt = t_ns - state.last_t_ns
    sign = jnp.where(rising, 1.0, -1.0)
    level1 = state.ref + sign * th
    t_first = state.last_t_ns + dt * (level1 - state.last_log) / safe_denom
    t_step = dt * th / jnp.maximum(jnp.abs(safe_denom), 1e-12)
    active = n > 0
    t_first = jnp.where(active, t_first, 0.0)
    t_step = jnp.where(active, t_step, 0.0)

    n_cross = n  # ref-level integrates EVERY crossing, emitted or suppressed
    last_event_t = state.last_event_t
    if refractory_period_ns > 0:
        r = jnp.float32(refractory_period_ns)
        # Evenly spaced crossings t_k = t_first + k*t_step, k in [0, n).
        # Greedy dead-time filter: emit k0 = first k with t_k >= last_emit + r,
        # then every s-th crossing with s = ceil(r / t_step) (a gap of s
        # crossings spans >= r ns). Degenerate t_step <= 0 (coincident
        # crossings) keeps at most the first surviving one via a huge stride.
        safe_step = jnp.maximum(t_step, 1e-6)
        k0 = jnp.ceil((last_event_t + r - t_first) / safe_step).astype(jnp.int32)
        k0 = jnp.maximum(k0, 0)
        s = jnp.maximum(jnp.ceil(r / safe_step).astype(jnp.int32), 1)
        n_emit = jnp.where(k0 < n, (n - 1 - k0) // s + 1, 0)
        emit = n_emit > 0
        t_first = jnp.where(emit, t_first + k0.astype(jnp.float32) * t_step, 0.0)
        t_step = jnp.where(emit, s.astype(jnp.float32) * t_step, 0.0)
        last_event_t = jnp.where(
            emit,
            t_first + (n_emit - 1).astype(jnp.float32) * t_step,
            last_event_t,
        )
        n = n_emit
    else:
        last_event_t = jnp.where(
            active, t_first + (n - 1).astype(jnp.float32) * t_step, last_event_t
        )

    new_ref = jnp.where(
        state.initialized,
        state.ref + sign * th * n_cross.astype(jnp.float32),
        log_frame,
    )
    events = CompactEvents(
        count=n,
        polarity=jnp.where(rising, 1, -1).astype(jnp.int32),
        t_first=t_first,
        t_step=t_step,
    )
    new_state = EsimState(
        ref=new_ref,
        last_log=log_frame,
        last_t_ns=jnp.asarray(t_ns, jnp.float32),
        initialized=jnp.asarray(True),
        last_event_t=last_event_t,
    )
    return new_state, events


@partial(jax.jit, static_argnames=(
    "pos_threshold", "neg_threshold", "max_events_per_pixel",
    "refractory_period_ns"))
def esim_video(
    log_frames: jax.Array,  # [F, H, W]
    t_ns: jax.Array,        # [F]
    state: EsimState,
    pos_threshold: float = 0.4,
    neg_threshold: float = 0.4,
    max_events_per_pixel: int = 25,
    refractory_period_ns: float = 0.0,
) -> Tuple[EsimState, CompactEvents]:
    """Scan ESIM over a chunk of frames; outputs stacked compact events
    [F, H, W] fields."""

    def step(s, inp):
        frame, t = inp
        return esim_step(
            s, frame, t, pos_threshold, neg_threshold, max_events_per_pixel,
            refractory_period_ns,
        )

    return jax.lax.scan(step, state, (log_frames, t_ns.astype(jnp.float32)))


def expand_compact_events(ev: "CompactEvents", frame_offset_idx: int = 0) -> np.ndarray:
    """Host-side expansion of one frame's compact events to an event list
    [N, 4] = (x, y, t_ns, p in {1, -1}), sorted by pixel row-major order."""
    count = np.asarray(ev.count)
    ys, xs = np.nonzero(count)
    if len(ys) == 0:
        return np.zeros((0, 4), np.float64)
    ns = count[ys, xs]
    pol = np.asarray(ev.polarity)[ys, xs]
    t0 = np.asarray(ev.t_first)[ys, xs].astype(np.float64)
    dt = np.asarray(ev.t_step)[ys, xs].astype(np.float64)

    total = int(ns.sum())
    out = np.empty((total, 4), np.float64)
    idx = np.repeat(np.arange(len(ys)), ns)
    k = np.concatenate([np.arange(c) for c in ns])
    out[:, 0] = xs[idx]
    out[:, 1] = ys[idx]
    out[:, 2] = t0[idx] + k * dt[idx]
    out[:, 3] = pol[idx]
    return out
