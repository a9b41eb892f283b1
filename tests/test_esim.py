"""ESIM JAX kernel tests vs a literal per-pixel while-loop oracle (the
reference algorithm's semantics, re-derived)."""

import jax.numpy as jnp
import numpy as np

from ev2hands_tpu.ops.esim import (
    bayer_mask,
    esim_init,
    esim_step,
    esim_video,
    expand_compact_events,
    log_intensity,
)


def esim_oracle(frames, times, pos_th, neg_th, cap=25, refractory_ns=0.0):
    """Per-pixel while-loop ESIM with linear time interpolation.

    ``refractory_ns`` reproduces esim_torch's dead time: a crossing earlier
    than ``last_emitted + r`` on the same pixel still advances the reference
    level but emits no event."""
    H, W = frames[0].shape
    ref = frames[0].copy()
    last_emit = np.full((H, W), -np.inf)
    events = []
    for f in range(1, len(frames)):
        L0, L1 = frames[f - 1], frames[f]
        t0, t1 = times[f - 1], times[f]
        for i in range(H):
            for j in range(W):
                n = 0
                while L1[i, j] - ref[i, j] >= pos_th and n < cap:
                    ref[i, j] += pos_th
                    denom = L1[i, j] - L0[i, j]
                    ts = t0 + (t1 - t0) * (ref[i, j] - L0[i, j]) / denom
                    if ts >= last_emit[i, j] + refractory_ns:
                        events.append((j, i, ts, 1))
                        last_emit[i, j] = ts
                    n += 1
                while L1[i, j] - ref[i, j] <= -neg_th and n < cap:
                    ref[i, j] -= neg_th
                    denom = L1[i, j] - L0[i, j]
                    ts = t0 + (t1 - t0) * (ref[i, j] - L0[i, j]) / denom
                    if ts >= last_emit[i, j] + refractory_ns:
                        events.append((j, i, ts, -1))
                        last_emit[i, j] = ts
                    n += 1
    return np.array(events, np.float64), ref


def test_esim_matches_oracle(rng):
    H, W, F = 6, 8, 5
    frames = rng.randn(F, H, W).astype(np.float32) * 1.2
    times = np.arange(F, dtype=np.float64) * 1e6  # 1 ms apart in ns

    state = esim_init(H, W)
    state, ev = esim_video(jnp.asarray(frames), jnp.asarray(times), state,
                           pos_threshold=0.4, neg_threshold=0.4)

    got = []
    for f in range(F):
        frame_ev = expand_compact_events(
            type(ev)(*[jnp.asarray(np.asarray(x)[f]) for x in ev])
        )
        got.append(frame_ev)
    got = np.concatenate(got, 0)

    ref_events, ref_state = esim_oracle(frames.astype(np.float64), times, 0.4, 0.4)

    # same per-pixel event counts and polarities
    def counts(evts):
        d = {}
        for x, y, t, p in evts:
            d[(int(x), int(y), int(p))] = d.get((int(x), int(y), int(p)), 0) + 1
        return d

    assert counts(got) == counts(ref_events)
    # final reference level matches
    np.testing.assert_allclose(np.asarray(state.ref), ref_state, atol=1e-4)
    # timestamps match (sort both the same way)
    key = lambda e: (e[0], e[1], e[2])
    got_sorted = np.array(sorted(map(tuple, got), key=key))
    ref_sorted = np.array(sorted(map(tuple, ref_events), key=key))
    np.testing.assert_allclose(got_sorted[:, 2], ref_sorted[:, 2], rtol=1e-3, atol=40.0)


def test_esim_refractory_matches_oracle(rng):
    """Nonzero dead time (esim_torch ``refractory_period_ns`` semantics,
    ``color_event_simulator.py:197-200``): crossings inside the dead time are
    suppressed, the reference level still integrates every crossing, and the
    dead time carries across frame pairs."""
    H, W, F = 6, 8, 6
    R_NS = 0.35e6  # 0.35 ms vs 1 ms frames: suppresses within AND across frames
    frames = rng.randn(F, H, W).astype(np.float32) * 1.5
    times = np.arange(F, dtype=np.float64) * 1e6

    state = esim_init(H, W)
    state, ev = esim_video(jnp.asarray(frames), jnp.asarray(times), state,
                           pos_threshold=0.4, neg_threshold=0.4,
                           refractory_period_ns=R_NS)

    got = []
    for f in range(F):
        got.append(expand_compact_events(
            type(ev)(*[jnp.asarray(np.asarray(x)[f]) for x in ev])
        ))
    got = np.concatenate(got, 0)

    ref_events, ref_state = esim_oracle(
        frames.astype(np.float64), times, 0.4, 0.4, refractory_ns=R_NS)
    ref_nofilter, _ = esim_oracle(frames.astype(np.float64), times, 0.4, 0.4)
    assert len(ref_events) < len(ref_nofilter), "test must actually suppress"
    assert len(got) == len(ref_events)

    # ref level integrates every crossing — identical to the r=0 run
    np.testing.assert_allclose(np.asarray(state.ref), ref_state, atol=1e-4)

    key = lambda e: (e[0], e[1], e[2])
    got_sorted = np.array(sorted(map(tuple, got), key=key))
    ref_sorted = np.array(sorted(map(tuple, ref_events), key=key))
    np.testing.assert_array_equal(got_sorted[:, :2], ref_sorted[:, :2])
    np.testing.assert_array_equal(got_sorted[:, 3], ref_sorted[:, 3])
    np.testing.assert_allclose(got_sorted[:, 2], ref_sorted[:, 2],
                               rtol=1e-3, atol=40.0)


def test_refractory_zero_is_identity(rng):
    """r=0 must be bit-identical to the pre-refractory event stream."""
    H, W, F = 5, 7, 4
    frames = rng.randn(F, H, W).astype(np.float32)
    times = np.arange(F, dtype=np.float64) * 1e6
    s0, ev0 = esim_video(jnp.asarray(frames), jnp.asarray(times),
                         esim_init(H, W))
    s1, ev1 = esim_video(jnp.asarray(frames), jnp.asarray(times),
                         esim_init(H, W), refractory_period_ns=0.0)
    for a, b in zip(ev0, ev1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(s0.ref), np.asarray(s1.ref))


def test_no_events_on_first_frame():
    H, W = 4, 4
    state = esim_init(H, W)
    state, ev = esim_step(state, jnp.ones((H, W)) * 5.0, jnp.asarray(0.0))
    assert int(jnp.sum(ev.count)) == 0
    # but the reference level adopted the frame
    np.testing.assert_allclose(np.asarray(state.ref), 5.0)


def test_static_change_no_events():
    H, W = 4, 4
    state = esim_init(H, W)
    f = jnp.ones((H, W))
    state, _ = esim_step(state, f, jnp.asarray(0.0))
    state, ev = esim_step(state, f, jnp.asarray(1e6))
    assert int(jnp.sum(ev.count)) == 0


def test_event_cap():
    H, W = 2, 2
    state = esim_init(H, W)
    state, _ = esim_step(state, jnp.zeros((H, W)), jnp.asarray(0.0))
    state, ev = esim_step(state, jnp.ones((H, W)) * 100.0, jnp.asarray(1e6),
                          max_events_per_pixel=25)
    assert int(jnp.max(ev.count)) == 25


def test_background_init_emits_on_first_frame():
    """The numba-variant semantics: mem starts at the background level, so a
    bright first frame generates crossings immediately."""
    H, W = 4, 4
    state = esim_init(H, W, background=159 / 255)
    bright = jnp.zeros((H, W))  # log intensity 0 >> log(bg^2.2+.01) ~ -0.9
    state, ev = esim_step(state, bright, jnp.asarray(1e6))
    assert int(jnp.sum(ev.count)) > 0


def test_bayer_log_front_end(rng):
    H, W = 6, 6
    mask = bayer_mask(H, W)
    assert mask.sum(-1).max() == 1 and mask.sum(-1).min() == 1
    rgb = jnp.asarray(rng.randint(0, 256, (H, W, 3)), jnp.uint8)
    li = log_intensity(rgb, jnp.asarray(mask))
    # oracle
    lin = (np.asarray(rgb) / 255.0) ** 2.2
    ref = np.log((lin * mask).sum(-1) + 1e-4)
    np.testing.assert_allclose(np.asarray(li), ref, rtol=1e-4, atol=1e-5)
