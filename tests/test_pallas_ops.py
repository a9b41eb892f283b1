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
