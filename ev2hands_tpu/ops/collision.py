"""Mesh collision detection + differentiable penetration loss, TPU-native.

Replaces the reference's two CUDA dependencies (SURVEY.md §2.4 N1/N2):
  * ``torch-mesh-isect BVH(max_collisions)`` — pointer-chasing BVH broad phase
    (``losses.py:63,92``)
  * ``mesh_intersection.DistanceFieldPenetrationLoss(sigma=0.5,
    penalize_outside=False)`` (``losses.py:70,94``)

The two-hand mesh has *fixed* topology (2 x 1538 MANO faces = 3076
triangles), so no tree is needed: a dense AABB broad phase selects a static
``max_pairs`` candidate set per batch element (the analogue of the BVH's
``max_collisions`` bound), an exact separating-axis (SAT) triangle-triangle
test confirms real intersections, and a smooth conical distance-field
penalty — positive only for vertices *behind* the other triangle's plane,
i.e. ``penalize_outside=False`` semantics — produces the differentiable loss.
Everything is fixed-shape and fuses into the surrounding XLA program.

Pairs of triangles sharing a mesh vertex are excluded via a static adjacency
mask (torch-mesh-isect likewise ignores vertex-sharing neighbors).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_two_hand_faces(faces_left: np.ndarray, faces_right: np.ndarray,
                         n_verts: int = 778) -> np.ndarray:
    """Concatenated face list with the right hand's indices offset
    (``losses.py:81``)."""
    return np.concatenate([faces_left, faces_right + n_verts], 0).astype(np.int32)


def build_adjacency_mask(faces: np.ndarray) -> np.ndarray:
    """Static [T, T] bool mask of triangle pairs sharing >=1 vertex (incl.
    self-pairs). Computed once on host; T=3076 -> 9.5 MB bool constant."""
    T = faces.shape[0]
    shares = np.zeros((T, T), bool)
    for k in range(3):
        for l in range(3):
            shares |= faces[:, k][:, None] == faces[None, :, l]
    return shares


class CollisionPairs(NamedTuple):
    pairs: jax.Array        # [B, K, 2] int32 triangle indices
    intersecting: jax.Array  # [B, K] bool — SAT-confirmed intersections


def _aabb(tris: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """tris [..., T, 3, 3] -> (lo [..., T, 3], hi [..., T, 3])."""
    return jnp.min(tris, axis=-2), jnp.max(tris, axis=-2)


def _interval_overlap(a_lo, a_hi, b_lo, b_hi, eps=0.0):
    return jnp.minimum(a_hi, b_hi) - jnp.maximum(a_lo, b_lo) + eps


def find_collision_pairs(
    triangles: jax.Array,     # [T, 3, 3] one batch element
    adjacency: jax.Array,     # [T, T] bool static exclusion
    max_pairs: int,
) -> CollisionPairs:
    """AABB broad phase -> top-``max_pairs`` candidates -> exact SAT test."""
    T = triangles.shape[0]
    lo, hi = _aabb(triangles)

    # Per-axis interval overlap depth; min over axes is the AABB overlap
    # depth (negative = separated). [T, T] fp32.
    depth = jnp.stack(
        [
            _interval_overlap(lo[:, None, a], hi[:, None, a], lo[None, :, a], hi[None, :, a])
            for a in range(3)
        ],
        axis=-1,
    ).min(-1)

    iu = jnp.triu(jnp.ones((T, T), bool), k=1)  # each unordered pair once
    # depth == 0 happens for touching boxes AND for overlapping boxes with a
    # zero-thickness axis (axis-aligned triangles) — keep them; the exact SAT
    # narrow phase below rejects the false positives.
    # Finite sentinel (not -inf) so the row-extraction matmul below stays
    # NaN-free (0 * -inf would poison it).
    NEG = jnp.float32(-1e30)
    score = jnp.where(iu & ~adjacency & (depth >= 0), depth, NEG)

    # Exact two-stage top-k: a single top_k over all T^2 scores dominated the
    # whole training step (~40 ms of a 110 ms step at B=8 — top_k over 9.5M
    # elements per sample). Instead select the top 2*max_pairs rows by their
    # row max — any pair in the global top-max_pairs lives in a row whose max
    # is >= the cutoff, and at most max_pairs (+ties) rows can satisfy that —
    # then run the small top_k over just those rows. Provably the same pair
    # set (up to ties at the cutoff), ~12x less data through top_k.
    R = min(2 * max_pairs, T)
    row_best = jnp.max(score, axis=1)                      # [T]
    _, top_rows = jax.lax.top_k(row_best, R)               # [R]
    # row extraction as a one-hot matmul (MXU) — lane gathers are slow here
    onehot = jax.nn.one_hot(top_rows, T, dtype=score.dtype)
    sub = jnp.dot(onehot, score,
                  precision=jax.lax.Precision.HIGHEST)     # [R, T]
    top, idx = jax.lax.top_k(sub.reshape(-1), max_pairs)
    pairs = jnp.stack(
        [top_rows[idx // T], idx % T], axis=-1
    ).astype(jnp.int32)
    candidate = top > NEG * 0.5

    tri_a = triangles[pairs[:, 0]]
    tri_b = triangles[pairs[:, 1]]
    hit = tri_tri_intersect(tri_a, tri_b) & candidate
    return CollisionPairs(pairs=pairs, intersecting=hit)


def tri_tri_intersect(tri_a: jax.Array, tri_b: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Exact triangle-triangle intersection via the separating-axis theorem.

    tri_a, tri_b: [..., 3, 3]. 11 candidate axes: both face normals + the 9
    edge-edge cross products; the triangles intersect iff no axis separates
    their projections. Degenerate (near-zero) axes are skipped.
    """
    ea = tri_a - jnp.roll(tri_a, -1, axis=-2)  # [..., 3, 3] edge vectors
    eb = tri_b - jnp.roll(tri_b, -1, axis=-2)
    n_a = jnp.cross(ea[..., 0, :], ea[..., 1, :])[..., None, :]
    n_b = jnp.cross(eb[..., 0, :], eb[..., 1, :])[..., None, :]
    cross_axes = jnp.cross(ea[..., :, None, :], eb[..., None, :, :]).reshape(
        *tri_a.shape[:-2], 9, 3
    )
    # In-plane edge normals (n x e) cover the coplanar case, where the 9
    # edge-edge crosses all degenerate to the face normal direction.
    inplane_a = jnp.cross(jnp.broadcast_to(n_a, ea.shape), ea)
    inplane_b = jnp.cross(jnp.broadcast_to(n_b, eb.shape), eb)
    axes = jnp.concatenate(
        [n_a, n_b, cross_axes, inplane_a, inplane_b], axis=-2
    )  # [..., 17, 3]

    pa = jnp.einsum("...kc,...vc->...kv", axes, tri_a)  # [..., 11, 3]
    pb = jnp.einsum("...kc,...vc->...kv", axes, tri_b)
    sep = (jnp.min(pa, -1) > jnp.max(pb, -1) + eps) | (
        jnp.min(pb, -1) > jnp.max(pa, -1) + eps
    )
    degenerate = jnp.sum(axes**2, -1) < eps
    separated = jnp.any(sep & ~degenerate, axis=-1)
    return ~separated


def penetration_penalty(
    triangles: jax.Array,   # [T, 3, 3]
    pairs: jax.Array,       # [K, 2]
    active: jax.Array,      # [K] bool
    sigma: float = 0.5,
) -> jax.Array:
    """Differentiable conical distance-field penetration per pair, [K].

    For pair (A, B): each vertex v of B behind A's plane (and radially near
    A's centroid) contributes ``relu(-(v-c_A)·n_A) * exp(-|v-c_A|^2/(2σ²))``,
    plus the symmetric term. Vertices in front contribute nothing
    (``penalize_outside=False`` semantics of the reference's
    DistanceFieldPenetrationLoss).
    """
    tri_a = triangles[pairs[:, 0]]  # [K, 3, 3]
    tri_b = triangles[pairs[:, 1]]

    def field(src, pts):
        c = jnp.mean(src, axis=-2, keepdims=True)           # [K, 1, 3]
        n = jnp.cross(src[:, 1] - src[:, 0], src[:, 2] - src[:, 0])
        # sqrt(x+eps) keeps the normal's gradient finite for degenerate
        # (zero-area) triangles — plain norm has d(sqrt)/dx -> inf at 0 and
        # poisons the whole backward pass via 0*inf even in masked lanes
        n = n / jnp.sqrt(jnp.sum(n**2, axis=-1, keepdims=True) + 1e-20)
        d = pts - c                                          # [K, 3, 3]
        behind = jax.nn.relu(-jnp.einsum("kvc,kc->kv", d, n))
        radial = jnp.exp(-jnp.sum(d**2, -1) / (2.0 * sigma**2))
        return jnp.sum(behind * radial, axis=-1)

    pen = field(tri_a, tri_b) + field(tri_b, tri_a)
    return jnp.where(active, pen, 0.0)


@partial(jax.jit, static_argnames=("max_pairs", "sigma", "weight"))
def collision_loss(
    verts_left: jax.Array,   # [B, V, 3]
    verts_right: jax.Array,  # [B, V, 3]
    faces: jax.Array,        # [2F, 3] combined two-hand faces (static)
    adjacency: jax.Array,    # [2F, 2F] bool (static)
    max_pairs: int = 128,
    sigma: float = 0.5,
    weight: float = 1e2,
) -> jax.Array:
    """Batched intersection-aware collision loss (``losses.py:74-102``):
    mean of positive penetration values across the batch's colliding pairs,
    times ``weight``. Returns a scalar (0 when nothing collides)."""
    verts = jnp.concatenate([verts_left, verts_right], axis=1)  # [B, 2V, 3]
    triangles = verts[:, faces]  # [B, T, 3, 3]

    def per_elem(tris):
        cp = find_collision_pairs(tris, adjacency, max_pairs)
        pen = penetration_penalty(tris, cp.pairs, cp.intersecting, sigma)
        return pen

    pen = jax.vmap(per_elem)(triangles)  # [B, K]
    nonzero = pen > 0
    total = jnp.sum(pen)
    count = jnp.sum(nonzero.astype(jnp.float32))
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0) * weight, 0.0)


@partial(jax.jit, static_argnames=("max_pairs",))
def collision_percentage(
    verts_left: jax.Array,
    verts_right: jax.Array,
    faces: jax.Array,
    adjacency: jax.Array,
    max_pairs: int = 256,
) -> jax.Array:
    """Percentage of triangles involved in >=1 intersecting pair, per batch
    element [B] (the non-collision eval score is 100 - this;
    ``evaluate_ev2hands_r.py:128-160``)."""
    verts = jnp.concatenate([verts_left, verts_right], axis=1)
    triangles = verts[:, faces]
    T = faces.shape[0]

    def per_elem(tris):
        cp = find_collision_pairs(tris, adjacency, max_pairs)
        flags = jnp.zeros((T,), bool)
        flags = flags.at[cp.pairs[:, 0]].max(cp.intersecting)
        flags = flags.at[cp.pairs[:, 1]].max(cp.intersecting)
        return jnp.sum(flags.astype(jnp.float32)) / T * 100.0

    return jax.vmap(per_elem)(triangles)
