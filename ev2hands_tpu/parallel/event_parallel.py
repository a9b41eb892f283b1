"""Event-dimension sharding: the context-parallelism analogue for event
clouds (SURVEY.md §5 "long-context").

Sequence models shard the token axis and ring-exchange KV; for point clouds
the analogous axis is events-per-window N, and the analogous exchange is
gather-by-centroid. This module shards the heavy per-pair work of a dense
set-abstraction scale over an ``event`` mesh axis:

  * every device holds an N/E shard of the per-point tensors (xyz, u);
  * centroids (new_xyz, v) are replicated — they are S-sized, tiny;
  * the "first K in-radius by index" rank needs a global exclusive prefix
    count across shards: each device all-gathers the per-(centroid, shard)
    in-radius counts and offsets its local ranks by the counts of all lower
    shards (the scan is over E values — free);
  * the masked max-pool is a ``jax.lax.pmax`` over the event axis;
  * the empty-neighborhood fallback (point 0's features) lives on shard 0
    and wins the pmax only when no device saw an in-radius point.

FLOPs per device drop by E; the only collectives are one all-gather of
[S, E] counts and one pmax of [S, C_out] — both tiny next to the pair math,
and both ride ICI. This lets N grow far past 2048 without exceeding a single
chip's compute budget.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EVENT_AXIS = "event"
DATA_AXIS = "data"


def create_event_mesh(n_event: int, n_data: int = 1) -> Mesh:
    """(data, event) 2-D device mesh: batch sharded over ``data``, the event
    dimension N sharded over ``event``."""
    import numpy as np

    devices = np.asarray(jax.devices()[: n_data * n_event]).reshape(
        n_data, n_event
    )
    return Mesh(devices, (DATA_AXIS, EVENT_AXIS))


def fold_bn_dense(
    kernel: jax.Array,   # [C_in, C_out]
    bias: jax.Array,     # [C_out]
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
) -> Tuple[jax.Array, jax.Array]:
    """Fold an eval-mode BatchNorm (running stats) into the preceding Dense:
    BN(Wx + b) == W'x + b' with W' = W * s, b' = (b - mean) * s + bn_bias,
    s = bn_scale / sqrt(var + eps)."""
    s = bn_scale * jax.lax.rsqrt(var + eps)
    return kernel * s[None, :], (bias - mean) * s + bn_bias


def _sharded_scale_body(
    xyz_shard: jax.Array,   # [B, N/E, 3] this device's events
    u_shard: jax.Array,     # [B, N/E, C1] per-point first-layer features
    new_xyz: jax.Array,     # [B, S, 3] replicated centroids
    v: jax.Array,           # [B, S, C1] replicated per-centroid features
    W2: jax.Array, b2: jax.Array,
    W3: jax.Array, b3: jax.Array,
    radius: float,
    nsample: int,
) -> jax.Array:
    """Runs inside shard_map over the event axis. Returns [B, S, C3]."""
    e_idx = jax.lax.axis_index(EVENT_AXIS)

    d2 = (
        jnp.sum(new_xyz**2, -1)[:, :, None]
        + jnp.sum(xyz_shard**2, -1)[:, None, :]
        - 2.0 * jnp.einsum("bsc,bnc->bsn", new_xyz, xyz_shard,
                           precision=jax.lax.Precision.HIGHEST)
    )
    mask = d2 <= radius * radius            # [B, S, n]

    # Global exclusive rank: local exclusive cumsum + total counts of all
    # lower-index shards (all-gather of per-shard counts, prefix by index).
    local_rank = jnp.cumsum(mask, axis=-1) - mask          # [B, S, n]
    local_count = jnp.sum(mask, axis=-1)                   # [B, S]
    all_counts = jax.lax.all_gather(local_count, EVENT_AXIS)  # [E, B, S]
    E = all_counts.shape[0]
    lower = jnp.arange(E) < e_idx
    offset = jnp.sum(all_counts * lower[:, None, None], axis=0)  # [B, S]
    rank = local_rank + offset[:, :, None]
    sel = mask & (rank < nsample)

    # conv chain over this shard's pairs only
    z = jax.nn.relu(u_shard[:, None, :, :] - v[:, :, None, :])  # [B, S, n, C1]
    h = jax.nn.relu(jnp.einsum("bsnc,cd->bsnd", z, W2) + b2)
    h = jax.nn.relu(jnp.einsum("bsnc,cd->bsnd", h, W3) + b3)    # [B, S, n, C3]

    pooled = jnp.max(jnp.where(sel[..., None], h, -jnp.inf), axis=2)

    # empty-neighborhood fallback: shard 0 contributes point 0's features at
    # just above -inf so it only wins when nothing was selected anywhere
    total_count = jnp.sum(all_counts, axis=0)  # [B, S]
    fallback = jnp.where(
        ((total_count == 0) & (e_idx == 0))[..., None],
        h[:, :, 0, :],
        -jnp.inf,
    )
    pooled = jnp.maximum(pooled, fallback)
    return jax.lax.pmax(pooled, EVENT_AXIS)


def _sharded_msg_scale_body(
    xyz_shard: jax.Array,    # [B', N/E, 3] this device's events
    pts_shard: jax.Array,    # [B', N/E, D] this device's per-point features
    new_xyz: jax.Array,      # [B', S, 3] centroids (replicated over event)
    *flat_wb: jax.Array,     # folded (W, b) pairs, flattened
    radius: float,
    nsample: int,
    s_chunk: int,
) -> jax.Array:
    """TEHNet's real dense MSG scale, event-sharded.  Runs inside shard_map.

    Layer 0 is decomposed like ``SetAbstractionMsg._dense_scale``
    (model/layers.py): conv0([f_n, x_n - c_s]) is linear, so the per-point
    half u_n = [f_n, x_n] @ W0 lives on the shard and the per-centroid half
    v_s = [0, c_s] @ W0 is replicated; z = u - v + b0.  The neighbor rule is
    the reference's "first nsample in-radius by global index": local
    exclusive cumsum + all-gathered lower-shard counts.  Collectives: one
    all_gather of [B', S] counts and one pmax of [B', S, C_out] — both tiny
    and ICI-resident; the quadratic [S, N/E] pair work stays local."""
    layers = [(flat_wb[2 * i], flat_wb[2 * i + 1])
              for i in range(len(flat_wb) // 2)]
    e_idx = jax.lax.axis_index(EVENT_AXIS)
    B, n, D = pts_shard.shape
    S = new_xyz.shape[1]

    hp = jax.lax.Precision.HIGHEST
    d2 = (
        jnp.sum(new_xyz**2, -1)[:, :, None]
        + jnp.sum(xyz_shard**2, -1)[:, None, :]
        - 2.0 * jnp.einsum("bsc,bnc->bsn", new_xyz, xyz_shard, precision=hp)
    )
    mask = d2 <= radius * radius                            # [B, S, n]

    local_rank = jnp.cumsum(mask, axis=-1) - mask
    local_count = jnp.sum(mask, axis=-1)                    # [B, S]
    all_counts = jax.lax.all_gather(local_count, EVENT_AXIS)  # [E, B, S]
    E = all_counts.shape[0]
    lower = jnp.arange(E) < e_idx
    offset = jnp.sum(all_counts * lower[:, None, None], axis=0)
    sel = mask & ((local_rank + offset[:, :, None]) < nsample)
    total_count = jnp.sum(all_counts, axis=0)               # [B, S]

    W0, b0 = layers[0]
    u = jnp.concatenate([pts_shard, xyz_shard], -1) @ W0    # [B, n, C1]
    v = jnp.concatenate(
        [jnp.zeros((B, S, D), xyz_shard.dtype), new_xyz], -1
    ) @ W0                                                  # [B, S, C1]

    outs = []
    for s0 in range(0, S, s_chunk):
        z = jax.nn.relu(
            u[:, None, :, :] - v[:, s0 : s0 + s_chunk, None, :] + b0
        )
        for W, b in layers[1:]:
            z = jax.nn.relu(jnp.einsum("bsnc,cd->bsnd", z, W) + b)
        m = sel[:, s0 : s0 + s_chunk, :, None]
        pooled = jnp.max(jnp.where(m, z, -jnp.inf), axis=2)
        # empty-neighborhood fallback (reference clamps to point 0): only
        # shard 0's local point 0 may stand in, and only when no shard saw
        # an in-radius point
        fb = jnp.where(
            ((total_count[:, s0 : s0 + s_chunk] == 0) & (e_idx == 0))[..., None],
            z[:, :, 0, :],
            -jnp.inf,
        )
        outs.append(jnp.maximum(pooled, fb))
    return jax.lax.pmax(jnp.concatenate(outs, axis=1), EVENT_AXIS)


def _shard_map(body, mesh, in_specs, out_specs):
    if hasattr(jax, "shard_map"):  # jax >= 0.6 API (check_vma keyword)
        return jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    from jax.experimental.shard_map import shard_map  # pragma: no cover

    return shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )


def event_sharded_msg_scale(
    mesh: Mesh,
    xyz: jax.Array,       # [B, N, 3]
    points: jax.Array,    # [B, N, D]
    new_xyz: jax.Array,   # [B, S, 3]
    layers: Sequence[Tuple[jax.Array, jax.Array]],  # folded (W, b) per layer
    radius: float,
    nsample: int,
    s_chunk: int = 64,
) -> jax.Array:
    """One dense MSG scale of TEHNet with the event axis N sharded over the
    mesh's ``event`` axis (and the batch over ``data`` when present).
    Numerically identical to ``SetAbstractionMsg._dense_scale`` with folded
    eval-mode BatchNorm."""
    data = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    body = partial(
        _sharded_msg_scale_body, radius=radius, nsample=nsample,
        s_chunk=s_chunk,
    )
    flat_wb = [a for wb in layers for a in wb]
    in_specs = (
        P(data, EVENT_AXIS, None),   # xyz
        P(data, EVENT_AXIS, None),   # points
        P(data, None, None),         # centroids: replicated over event
    ) + tuple(P() for _ in flat_wb)
    out_specs = P(data, None, None)
    return _shard_map(body, mesh, in_specs, out_specs)(
        xyz, points, new_xyz, *flat_wb
    )


def event_sharded_dense_scale(
    mesh: Mesh,
    xyz: jax.Array,      # [B, N, 3]
    u: jax.Array,        # [B, N, C1]
    new_xyz: jax.Array,  # [B, S, 3]
    v: jax.Array,        # [B, S, C1]
    W2: jax.Array, b2: jax.Array, W3: jax.Array, b3: jax.Array,
    radius: float,
    nsample: int,
) -> jax.Array:
    """Dense grouping scale with the event (N) axis sharded over ``mesh``'s
    ``event`` axis. Numerically identical to the single-device dense scale."""
    body = partial(_sharded_scale_body, radius=radius, nsample=nsample)
    in_specs = (
        P(None, EVENT_AXIS, None),  # xyz
        P(None, EVENT_AXIS, None),  # u
        P(),                         # new_xyz replicated
        P(),                         # v replicated
        P(), P(), P(), P(),          # weights replicated
    )
    if hasattr(jax, "shard_map"):  # jax >= 0.6 API (check_vma keyword)
        fn = jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
        )
    else:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        fn = shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=P(), check_rep=False
        )
    return fn(xyz, u, new_xyz, v, W2, b2, W3, b3)
