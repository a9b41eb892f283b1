"""Core point-cloud ops for PointNet++-style networks, as fixed-shape JAX.

TPU-native re-designs of the reference's pure-PyTorch ops
(``src/Ev2Hands/model/pointnet2_utils.py``):

* ``farthest_point_sample`` — the reference runs a sequential Python loop of
  ``npoint`` iterations (``pointnet2_utils.py:77-83``); here it is a
  ``lax.scan`` with an in-register distance carry, so the whole sampling
  compiles into the surrounding XLA program.
* ``query_ball_point`` — the reference builds an [B,S,N] index grid, writes a
  sentinel N for out-of-radius points, sorts, takes the first ``nsample`` and
  backfills with the first in-radius index (``pointnet2_utils.py:87-107``).
  We reproduce those semantics exactly (smallest-index-first selection,
  first-point backfill) with a single ``lax.top_k`` instead of a full sort.
* ``three_nn_interpolate`` — inverse-distance-weighted 3-NN feature
  propagation (``pointnet2_utils.py:293-303``) via ``top_k`` instead of a
  full sort.

Layout convention: channels-last ``[B, N, C]`` everywhere (the natural layout
for XLA on TPU); the reference's ``[B, C, N]``/permute dance does not exist
here.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distance, [B, N, C] x [B, M, C] -> [B, N, M].

    Uses the |a|^2 + |b|^2 - 2ab expansion so the inner product hits the MXU
    (reference: ``pointnet2_utils.py:19-40``).
    """
    d = -2.0 * jnp.einsum(
        "bnc,bmc->bnm", src, dst, precision=jax.lax.Precision.HIGHEST
    )
    d = d + jnp.sum(src**2, axis=-1)[:, :, None]
    d = d + jnp.sum(dst**2, axis=-1)[:, None, :]
    return d


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: points [B, N, C], idx [B, ...] -> [B, ..., C]."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


def farthest_point_sample(
    xyz: jax.Array,
    npoint: int,
    key: Optional[jax.Array] = None,
    start_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Farthest-point sampling, [B, N, 3] -> [B, npoint] int32 indices.

    Matches the reference algorithm (greedy max-min over running nearest
    distances, ``pointnet2_utils.py:63-84``) including its random start point
    (``torch.randint`` at ``:75``); pass ``key`` for a random start or
    ``start_idx``/nothing for a deterministic start at index 0.
    """
    B, N, _ = xyz.shape
    if key is not None:
        farthest = jax.random.randint(key, (B,), 0, N)
    elif start_idx is not None:
        farthest = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (B,))
    else:
        farthest = jnp.zeros((B,), jnp.int32)

    def step(carry, _):
        distance, farthest = carry
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # [B,1,3]
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)  # [B, N]
        distance = jnp.minimum(distance, dist)
        next_farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return (distance, next_farthest), farthest

    init = (jnp.full((B, N), 1e10, xyz.dtype), farthest.astype(jnp.int32))
    _, centroids = jax.lax.scan(step, init, None, length=npoint)
    return centroids.T  # [B, npoint]


def query_ball_point(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array,
    sqrdists: Optional[jax.Array] = None,
    rank: bool = False,
) -> jax.Array:
    """Radius neighborhood query, -> [B, S, nsample] int32 indices.

    Reference semantics (``pointnet2_utils.py:87-107``): for each query point,
    the ``nsample`` *lowest-index* points within ``radius``; slots beyond the
    in-radius count are backfilled with the first in-radius index. If a query
    has no in-radius point at all (cannot happen when queries are sampled from
    ``xyz``), indices clamp to N-1 instead of the reference's out-of-bounds N.

    Pass ``sqrdists`` ([B, S, N]) to reuse a precomputed distance tensor —
    multi-scale grouping shares one across its radii (recomputing it per
    scale measured ~2.4 ms/scale at B=8, N=2048 on v5e).

    Formulation A/Bs (TPU v5e, B=8 N=2048 S=512, the 3 sa1 scales, honest
    key-perturbed timing over the fps+sqrdists base):

    * ``rank=False`` — single ``top_k`` on i32 scores: 7.55-8.73 ms.
      f32 scores 8.42 ms (bitcast-int sort gains nothing, the cast costs);
      exact two-stage chunked top_k (chunk winners then re-top_k) 38.6 ms
      at chunk=256 / 47.2 ms at chunk=512 — the reshape+double-sort
      lowering is ~5x worse; never chunk TPU top_k (scripts/ab_select.py).
    * ``rank=True`` — NO sort at all: with the inclusive in-radius rank
      r[n] = cumsum(mask)[n], the j-th selected index is the count
      #{n : r[n] <= j} (stream compaction as a counting problem), an
      O(N*K) VPU compare-reduce instead of the O(N log^2 N) bitonic
      top_k. 6.84 ms vs 8.73 ms measured head-to-head — 22% faster, and
      bitwise-identical output (asserted on-device at production shapes,
      scripts/ab_rank_select.py). Fusing the three scales' reduces into
      one stacked pass measured WORSE (12.4 ms — the [3, B, S, N, Kmax]
      broadcast pads every scale to Kmax=128). This is the same
      cumsum-rank machinery the dense eval path's selection mask already
      uses (ops/pallas_grouping.dense_selection_mask).

    ``rank`` stays a per-call switch (threaded from
    ``ModelConfig.rank_ball_query``) rather than an unconditional
    replacement so the step-level decision is recorded where every other
    formulation A/B lives.
    """
    B, N, _ = xyz.shape
    if sqrdists is None:
        sqrdists = square_distance(new_xyz, xyz)  # [B, S, N]
    if rank:
        mask = sqrdists <= radius**2
        # inclusive in-radius rank; non-decreasing along the point axis
        ranks = jnp.cumsum(mask, axis=-1, dtype=jnp.int32)  # [B, S, N]
        cnt = ranks[..., -1:]                               # [B, S, 1]
        j = jnp.arange(nsample, dtype=jnp.int32)
        # positions strictly before the (j+1)-th selected point are exactly
        # those whose inclusive rank is still <= j
        idx = jnp.sum((ranks[..., None] <= j).astype(jnp.int32), axis=2)
        first = idx[..., :1]
        idx = jnp.where(j < cnt, idx, first)  # backfill w/ first in-radius
        # all-empty neighborhoods leave idx == N everywhere (rank stays 0),
        # so the clamp lands on N-1 exactly like the top_k path
        return jnp.minimum(idx, N - 1)
    arange = jnp.arange(N, dtype=jnp.int32)
    scores = jnp.where(sqrdists <= radius**2, arange, N)  # [B, S, N]
    # nsample smallest scores in ascending order == reference's sort+slice.
    # (nsample can exceed N for tiny debug clouds; extra slots backfill.)
    k = min(nsample, N)
    neg_topk, _ = jax.lax.top_k(-scores, k)
    group_idx = -neg_topk  # [B, S, k], ascending
    first = group_idx[:, :, :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    if k < nsample:
        pad = jnp.broadcast_to(first, (B, group_idx.shape[1], nsample - k))
        group_idx = jnp.concatenate([group_idx, pad], axis=-1)
    return jnp.minimum(group_idx, N - 1)


def query_ball_point_permuted(
    radius: float, nsample: int, perm: jax.Array, sqrdists_p: jax.Array,
) -> jax.Array:
    """Ball query over a PERMUTED point axis -> positions into that axis.

    ``perm`` [B, N] maps permuted position -> original index;
    ``sqrdists_p`` [B, S, N] are squared distances with columns in permuted
    order (``square_distance(new_xyz, xyz_p)``). Selection semantics are the
    reference's exactly (``pointnet2_utils.py:87-107``): the score packed
    into ``top_k`` is the *original* index, so the chosen multiset is the
    ``nsample`` lowest-original-index in-radius points and the slot order is
    ascending original index — while the returned values are the PERMUTED
    positions ``top_k`` found them at, ready to gather from Morton-ordered
    sources (ops/pallas_gather.py) with no index-translation gather.

    Element [b, s, j] of ``sqrdists_p`` depends only on (query s, point
    perm[j]), so the in-radius mask is bitwise the permutation of the
    unpermuted mask and the selected multiset is bitwise-identical to
    ``query_ball_point``'s.
    """
    B, S, N = sqrdists_p.shape
    scores = jnp.where(
        sqrdists_p <= radius**2, perm[:, None, :], N
    )  # [B, S, N]; in-radius scores are distinct original indices
    k = min(nsample, N)
    neg_topk, pos = jax.lax.top_k(-scores, k)
    vals = -neg_topk  # ascending original index; N marks unfilled slots
    first = pos[:, :, :1]
    pos = jnp.where(vals == N, first, pos)  # backfill w/ first in-radius pos
    if k < nsample:
        pad = jnp.broadcast_to(first, (B, S, nsample - k))
        pos = jnp.concatenate([pos, pad], axis=-1)
    # all-empty queries cannot happen when queries are sampled from the
    # cloud (self-distance 0); clamp keeps indices in range regardless
    return jnp.minimum(pos, N - 1)


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    points: Optional[jax.Array],
    fps_idx: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """FPS + ball query + relative grouping (``pointnet2_utils.py:110-138``).

    Returns (new_xyz [B, S, 3], grouped [B, S, nsample, 3+D]); grouped
    features are the centered xyz concat any input features.
    """
    B, N, C = xyz.shape
    if fps_idx is None:
        fps_idx = farthest_point_sample(xyz, npoint, key=key)
    new_xyz = index_points(xyz, fps_idx)  # [B, S, C]
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx)  # [B, S, nsample, C]
    grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        grouped = jnp.concatenate([grouped_xyz_norm, grouped_points], axis=-1)
    else:
        grouped = grouped_xyz_norm
    return new_xyz, grouped


def group_all(xyz: jax.Array, points: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """Single global group (``pointnet2_utils.py:141-158``): new_xyz is the
    origin; grouped features are the *raw* (uncentered) xyz concat features."""
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        grouped = jnp.concatenate([grouped_xyz, points[:, None, :, :]], axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped


def three_nn_interpolate(
    xyz1: jax.Array, xyz2: jax.Array, points2: jax.Array
) -> jax.Array:
    """Inverse-distance-weighted 3-NN interpolation of features from the
    coarse set (xyz2, points2) onto the dense set xyz1.

    xyz1 [B, N, C], xyz2 [B, S, C], points2 [B, S, D] -> [B, N, D]
    (reference: ``pointnet2_utils.py:293-303``).

    TPU note: implemented as three argmin passes (mask-and-repeat) plus a
    one-hot weight matrix contracted on the MXU — 6-7x faster than the
    sort-based top_k + gather formulation, with identical tie-breaking
    (first minimum wins, like a stable sort).
    """
    dists = square_distance(xyz1, xyz2)  # [B, N, S]
    S = xyz2.shape[1]
    ar = jnp.arange(S)

    idxs, ds = [], []
    d = dists
    for _ in range(3):
        i = jnp.argmin(d, axis=-1)
        ds.append(jnp.min(d, axis=-1))
        idxs.append(i)
        d = jnp.where(ar[None, None, :] == i[..., None], jnp.inf, d)

    d3 = jnp.stack(ds, -1)  # [B, N, 3] ascending squared distances
    recip = 1.0 / (d3 + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)

    # Sparse-3 interpolation weights as a dense [B, N, S] matrix -> matmul.
    W = jnp.zeros_like(dists)
    for j in range(3):
        W = W + weight[..., j : j + 1] * (ar[None, None, :] == idxs[j][..., None])
    return jnp.einsum(
        "bns,bsd->bnd", W, points2, precision=jax.lax.Precision.HIGHEST
    )


@partial(jax.jit, static_argnums=(1,))
def fps_jit(xyz: jax.Array, npoint: int) -> jax.Array:
    """Standalone jitted FPS (deterministic start) for benchmarking."""
    return farthest_point_sample(xyz, npoint)
