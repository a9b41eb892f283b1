"""Pallas TPU kernels for the hot point-cloud ops.

``fps_pallas``: farthest-point sampling as ONE kernel. The reference runs a
512-iteration Python loop (``pointnet2_utils.py:77-83``); the plain-JAX
``lax.scan`` port pays per-step HBM round trips for the [B, N] distance
carry. Here the whole greedy loop runs on-chip: the point cloud lives in VMEM
in a lane-friendly [3, N] layout, the running min-distance vector stays in
registers/VMEM, and per-step dynamic indexing is replaced by one-hot
reductions (lane-dynamic gathers are slow on TPU; a 3xN one-hot dot is not).

Numerics and tie-breaking match ``ops.pointnet.farthest_point_sample``
exactly (argmax takes the first maximum).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(start_ref, xyz_ref, out_ref, *, npoint: int):
    """One batch element: start_ref [B] i32 (scalar-prefetch), xyz_ref
    [1, 3, N] f32, out_ref [1, 1, npoint] i32."""
    N = xyz_ref.shape[2]
    x = xyz_ref[0]  # [3, N]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    def body(i, carry):
        mindist, farthest, out = carry
        # record the current farthest index at slot i (one-hot store)
        out = out + farthest * (out_lane == i).astype(jnp.int32)
        # centroid coordinates via one-hot contraction (no lane gather)
        onehot = (lane == farthest).astype(jnp.float32)  # [1, N]
        centroid = jnp.sum(x * onehot, axis=1, keepdims=True)  # [3, 1]
        cur = jnp.sum((x - centroid) ** 2, axis=0, keepdims=True)  # [1, N]
        mindist = jnp.minimum(mindist, cur)
        new_far = jnp.argmax(mindist, axis=1).astype(jnp.int32)[0]
        return mindist, new_far, out

    init = (
        jnp.full((1, N), 1e10, jnp.float32),
        start_ref[pl.program_id(0)],
        jnp.zeros((1, npoint), jnp.int32),
    )
    _, _, out = jax.lax.fori_loop(0, npoint, body, init)
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(
    xyz: jax.Array,                 # [B, N, 3] float32
    npoint: int,
    start: Optional[jax.Array] = None,  # [B] int32 start indices
    interpret: bool = False,
) -> jax.Array:
    """Farthest-point sampling, [B, N, 3] -> [B, npoint] int32."""
    B, N, _ = xyz.shape
    if start is None:
        start = jnp.zeros((B,), jnp.int32)
    xzt = jnp.transpose(xyz, (0, 2, 1))  # [B, 3, N] lane-friendly

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b, *_: (b, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        interpret=interpret,
    )(start.astype(jnp.int32), xzt)
    return out[:, 0, :]


def fps_auto(
    xyz: jax.Array,
    npoint: int,
    key: Optional[jax.Array] = None,
    start_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Platform-dispatching FPS: the Pallas kernel on TPU, the lax.scan
    implementation elsewhere. Drop-in for
    ``ops.pointnet.farthest_point_sample`` (same semantics and RNG use)."""
    from ev2hands_tpu.ops.pointnet import farthest_point_sample

    B, N, _ = xyz.shape
    on_tpu = jax.default_backend() == "tpu" or any(
        d.platform == "tpu" for d in jax.devices()
    )
    if not on_tpu:
        return farthest_point_sample(xyz, npoint, key=key, start_idx=start_idx)

    if key is not None:
        start = jax.random.randint(key, (B,), 0, N).astype(jnp.int32)
    elif start_idx is not None:
        start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (B,))
    else:
        start = jnp.zeros((B,), jnp.int32)
    return fps_pallas(xyz, npoint, start)
