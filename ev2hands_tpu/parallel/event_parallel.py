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
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EVENT_AXIS = "event"


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
