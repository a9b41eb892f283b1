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


def event_sharded_fps(
    mesh: Mesh,
    xyz: jax.Array,       # [B, N, 3]
    npoint: int,
    key=None,
) -> jax.Array:
    """Farthest-point sampling with the event axis N sharded over the mesh's
    ``event`` axis — removes the replicated O(npoint * N) scan that was the
    unsharded Amdahl term of the event-parallel path.

    Exact equivalence with ``ops.pointnet.farthest_point_sample`` (same
    greedy max-min, same first-max tie-breaking): each device keeps the
    running min-distance for its N/E block; per step the winning centroid's
    coordinates are shared with a psum (owner contributes, others zero) and
    the global argmax is an all-gather of E per-shard (value, index)
    candidates — argmax over shards picks the lowest shard on ties, which is
    exactly the first-occurrence rule of the unsharded argmax over N.
    Per-step collectives move O(E * B) scalars over ICI; the O(N) distance
    work is E-way parallel.
    """
    data = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    B, N, _ = xyz.shape
    if key is not None:
        start = jax.random.randint(key, (B,), 0, N).astype(jnp.int32)
    else:
        start = jnp.zeros((B,), jnp.int32)

    def body(xyz_shard, start_local):
        e_idx = jax.lax.axis_index(EVENT_AXIS)
        b, n, _ = xyz_shard.shape

        def step(carry, _):
            dist, far = carry                          # [b, n], [b] global
            owner = (far // n) == e_idx
            li = far % n
            cx = jnp.take_along_axis(xyz_shard, li[:, None, None], 1)[:, 0]
            cx = jnp.where(owner[:, None], cx, 0.0)
            cx = jax.lax.psum(cx, EVENT_AXIS)          # [b, 3]
            d = jnp.sum((xyz_shard - cx[:, None, :]) ** 2, -1)
            dist = jnp.minimum(dist, d)
            lbest = jnp.argmax(dist, -1).astype(jnp.int32)          # [b]
            lval = jnp.take_along_axis(dist, lbest[:, None], 1)[:, 0]
            vals = jax.lax.all_gather(lval, EVENT_AXIS)             # [E, b]
            gidx = jax.lax.all_gather(lbest + e_idx * n, EVENT_AXIS)
            win = jnp.argmax(vals, axis=0)                          # [b]
            nxt = jnp.take_along_axis(gidx, win[None, :], 0)[0]
            return (dist, nxt.astype(jnp.int32)), far

        init = (jnp.full((b, n), 1e10, xyz_shard.dtype), start_local)
        _, centroids = jax.lax.scan(step, init, None, length=npoint)
        return centroids.T                              # [b, npoint]

    return _shard_map(
        body, mesh,
        (P(data, EVENT_AXIS, None), P(data)),
        P(data, None),
    )(xyz, start)


def event_sharded_train_msg_scale(
    mesh: Mesh,
    xyz: jax.Array,       # [B, N, 3]
    points: jax.Array,    # [B, N, D]
    new_xyz: jax.Array,   # [B, S, 3]
    conv_params: Sequence[Tuple[jax.Array, jax.Array]],  # raw (W, b)
    bn_params: Sequence[Tuple[jax.Array, jax.Array]],    # (scale, bias)
    radius: float,
    nsample: int,
    s_chunk: int = 64,
    eps: float = 1e-5,
):
    """One dense MSG scale in TRAINING mode, event-sharded and differentiable.

    The training analogue of ``event_sharded_msg_scale``: BatchNorm batch
    statistics are the multiplicity-weighted mean/var over the gather path's
    selected-neighbor multiset (see layers._dense_train_scale), accumulated
    per shard and ``psum``-ed over the event axis (and the data axis when
    the mesh has one, matching global-batch BN). Pooling all-gathers the
    per-shard masked max/min of the pre-BN last layer (``pmax`` has no VJP;
    the [E, B, S, C] gather is tiny) and applies the monotone BN affine by
    slope sign. Returns (pooled [B, S, C_last], [(mean, var)] per layer) —
    the caller owns the running-stat update.
    """
    data = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    L = len(conv_params)
    B_global = xyz.shape[0]
    S = new_xyz.shape[1]
    count = float(B_global * S * nsample)
    flat = [a for wb in conv_params for a in wb] + [
        a for sb_ in bn_params for a in sb_
    ]

    def body(xyz_shard, pts_shard, new_xyz_r, *flat_args):
        convs = [(flat_args[2 * i], flat_args[2 * i + 1]) for i in range(L)]
        bns = [(flat_args[2 * L + 2 * i], flat_args[2 * L + 2 * i + 1])
               for i in range(L)]
        e_idx = jax.lax.axis_index(EVENT_AXIS)
        b, n, D = pts_shard.shape
        stat_axes = (DATA_AXIS, EVENT_AXIS) if data else (EVENT_AXIS,)

        hp = jax.lax.Precision.HIGHEST
        d2 = (
            jnp.sum(new_xyz_r**2, -1)[:, :, None]
            + jnp.sum(xyz_shard**2, -1)[:, None, :]
            - 2.0 * jnp.einsum("bsc,bnc->bsn", new_xyz_r, xyz_shard,
                               precision=hp)
        )
        mask = d2 <= radius * radius                       # [b, S, n]
        local_rank = jnp.cumsum(mask, axis=-1) - mask
        local_count = jnp.sum(mask, axis=-1)
        all_counts = jax.lax.all_gather(local_count, EVENT_AXIS)  # [E, b, S]
        E = all_counts.shape[0]
        lower = jnp.arange(E) < e_idx
        offset = jnp.sum(all_counts * lower[:, None, None], axis=0)
        grank = local_rank + offset[:, :, None]
        sel = mask & (grank < nsample)
        first = mask & (grank == 0)
        total = jnp.sum(all_counts, axis=0)                # [b, S]
        empty = total == 0
        at0 = (jnp.arange(n) == 0) & (e_idx == 0)          # global point 0
        sel = sel | (empty[..., None] & at0)
        w = sel.astype(xyz_shard.dtype) + first.astype(xyz_shard.dtype) * (
            jnp.maximum(nsample - total, 0)[..., None].astype(xyz_shard.dtype)
        )
        w = jnp.where(empty[..., None] & at0, float(nsample), w)

        W0, b0 = convs[0]
        u = jnp.concatenate([pts_shard, xyz_shard], -1) @ W0 + b0
        v = jnp.concatenate(
            [jnp.zeros((b, S, D), xyz_shard.dtype), new_xyz_r], -1
        ) @ W0

        chunk = max(1, min(s_chunk, S))

        def chunk_stats(l, s0, affines):
            z = u[:, None, :, :] - v[:, s0:s0 + chunk, None, :]
            for j in range(l):
                a_, b_ = affines[j]
                Wj, bj = convs[j + 1]
                z = jax.nn.relu(a_ * z + b_) @ Wj + bj
            wc = w[:, s0:s0 + chunk, :, None]
            s_ = jnp.sum(wc * z, axis=(0, 1, 2))
            q_ = jnp.sum(wc * (z * z), axis=(0, 1, 2))
            if l == L - 1:
                m = sel[:, s0:s0 + chunk, :, None]
                zmx = jnp.max(jnp.where(m, z, -jnp.inf), axis=2)
                zmn = jnp.min(jnp.where(m, z, jnp.inf), axis=2)
                return s_, q_, zmx, zmn
            return s_, q_

        affines, stats = [], []
        mx_c, mn_c = [], []
        for l in range(L):
            C = convs[l][0].shape[-1]
            acc_s = jnp.zeros((C,), xyz_shard.dtype)
            acc_q = jnp.zeros((C,), xyz_shard.dtype)
            for s0 in range(0, S, chunk):
                res = jax.checkpoint(partial(chunk_stats, l, s0))(affines)
                if l == L - 1:
                    s_, q_, zmx, zmn = res
                    mx_c.append(zmx)
                    mn_c.append(zmn)
                else:
                    s_, q_ = res
                acc_s = acc_s + s_
                acc_q = acc_q + q_
            acc_s = jax.lax.psum(acc_s, stat_axes)
            acc_q = jax.lax.psum(acc_q, stat_axes)
            mean = acc_s / count
            var = jnp.maximum(acc_q / count - mean**2, 0.0)
            g_, be_ = bns[l]
            a_ = g_ / jnp.sqrt(var + eps)
            affines.append((a_, be_ - mean * a_))
            stats.append((mean, var))

        mx = jnp.concatenate(mx_c, axis=1)                 # [b, S, C]
        mn = jnp.concatenate(mn_c, axis=1)
        # cross-shard pool: all_gather (differentiable, unlike pmax)
        mx = jnp.max(jax.lax.all_gather(mx, EVENT_AXIS), axis=0)
        mn = jnp.min(jax.lax.all_gather(mn, EVENT_AXIS), axis=0)
        a_, b_ = affines[-1]
        pooled = jax.nn.relu(a_ * jnp.where(a_ >= 0, mx, mn) + b_)
        flat_stats = [x for mv in stats for x in mv]
        return (pooled, *flat_stats)

    in_specs = (
        P(data, EVENT_AXIS, None),
        P(data, EVENT_AXIS, None),
        P(data, None, None),
    ) + tuple(P() for _ in flat)
    out_specs = (P(data, None, None),) + tuple(P() for _ in range(2 * L))
    res = _shard_map(body, mesh, in_specs, out_specs)(
        xyz, points, new_xyz, *flat
    )
    pooled = res[0]
    stats = [(res[1 + 2 * i], res[2 + 2 * i]) for i in range(L)]
    return pooled, stats
