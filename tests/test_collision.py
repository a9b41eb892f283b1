"""Collision kernel tests: exact SAT predicate on hand-constructed cases,
broad-phase behavior, loss properties (zero when separated, positive and
repulsive-gradient when interpenetrating)."""

import jax
import jax.numpy as jnp
import numpy as np

from ev2hands_tpu.ops.collision import (
    build_adjacency_mask,
    build_two_hand_faces,
    collision_loss,
    collision_percentage,
    find_collision_pairs,
    tri_tri_intersect,
)


def T(*rows):
    return jnp.asarray(np.array(rows, np.float32))


def test_tri_tri_clear_intersection():
    a = T([0, 0, 0], [1, 0, 0], [0, 1, 0])
    b = T([0.2, 0.2, -0.5], [0.3, 0.2, 0.5], [0.2, 0.3, 0.5])  # pierces a
    assert bool(tri_tri_intersect(a, b))


def test_tri_tri_separated():
    a = T([0, 0, 0], [1, 0, 0], [0, 1, 0])
    b = T([0, 0, 1], [1, 0, 1], [0, 1, 1])  # parallel, 1 above
    assert not bool(tri_tri_intersect(a, b))


def test_tri_tri_coplanar_overlapping_and_disjoint():
    a = T([0, 0, 0], [1, 0, 0], [0, 1, 0])
    b = T([0.1, 0.1, 0], [1.1, 0.1, 0], [0.1, 1.1, 0])
    c = T([5, 5, 0], [6, 5, 0], [5, 6, 0])
    assert bool(tri_tri_intersect(a, b))
    assert not bool(tri_tri_intersect(a, c))


def test_tri_tri_near_miss():
    a = T([0, 0, 0], [1, 0, 0], [0, 1, 0])
    b = T([2, 0, -0.5], [2.5, 0, 0.5], [2, 0.5, 0.5])  # crosses plane, off to the side
    assert not bool(tri_tri_intersect(a, b))


def test_tri_tri_batched(rng):
    a = jnp.asarray(rng.randn(16, 3, 3), jnp.float32)
    b = jnp.asarray(rng.randn(16, 3, 3), jnp.float32)
    out = tri_tri_intersect(a, b)
    assert out.shape == (16,)
    for i in range(16):
        assert bool(out[i]) == bool(tri_tri_intersect(a[i], b[i]))


def _two_tet_mesh(offset):
    """Two tetrahedra as a toy 'two hands': second one shifted by offset."""
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    vl = verts
    vr = verts + np.asarray(offset, np.float32)
    return vl, vr, faces


def test_find_pairs_cross_mesh():
    vl, vr, faces = _two_tet_mesh([0.25, 0.25, 0.25])  # interpenetrating
    two = build_two_hand_faces(faces, faces, n_verts=4)
    adj = build_adjacency_mask(two)
    verts = jnp.concatenate([jnp.asarray(vl), jnp.asarray(vr)], 0)
    tris = verts[jnp.asarray(two)]
    cp = find_collision_pairs(tris, jnp.asarray(adj), max_pairs=16)
    hits = np.asarray(cp.intersecting)
    pairs = np.asarray(cp.pairs)[hits]
    assert hits.any()
    # all confirmed pairs must be cross-mesh (adjacency excludes same-tet
    # sharing, but same-tet non-sharing pairs don't exist in a tetrahedron)
    assert np.all((pairs[:, 0] < 4) != (pairs[:, 1] < 4))


def test_collision_loss_zero_when_separated():
    vl, vr, faces = _two_tet_mesh([10.0, 0, 0])
    two = build_two_hand_faces(faces, faces, n_verts=4)
    adj = jnp.asarray(build_adjacency_mask(two))
    loss = collision_loss(
        jnp.asarray(vl)[None], jnp.asarray(vr)[None], jnp.asarray(two), adj,
        max_pairs=16,
    )
    assert float(loss) == 0.0


def test_collision_loss_positive_and_repulsive():
    vl, vr, faces = _two_tet_mesh([0.3, 0.2, 0.2])
    two = build_two_hand_faces(faces, faces, n_verts=4)
    adj = jnp.asarray(build_adjacency_mask(two))

    def loss_of_shift(s):
        return collision_loss(
            jnp.asarray(vl)[None], (jnp.asarray(vr) + s)[None], jnp.asarray(two),
            adj, max_pairs=16,
        )

    l0 = float(loss_of_shift(jnp.zeros(3)))
    assert l0 > 0

    g = jax.grad(lambda s: loss_of_shift(s))(jnp.zeros(3))
    # moving the second tet along +x (apart) should reduce the loss
    moved = float(loss_of_shift(jnp.asarray([1.0, 1.0, 1.0]) * 0.5))
    assert moved < l0
    assert np.all(np.isfinite(np.asarray(g)))


def test_collision_percentage_range():
    vl, vr, faces = _two_tet_mesh([0.25, 0.25, 0.25])
    two = build_two_hand_faces(faces, faces, n_verts=4)
    adj = jnp.asarray(build_adjacency_mask(two))
    pct = collision_percentage(
        jnp.asarray(vl)[None], jnp.asarray(vr)[None], jnp.asarray(two), adj,
        max_pairs=16,
    )
    assert 0 < float(pct[0]) <= 100

    far = collision_percentage(
        jnp.asarray(vl)[None], (jnp.asarray(vr) + 100)[None], jnp.asarray(two),
        adj, max_pairs=16,
    )
    assert float(far[0]) == 0.0


def test_adjacency_mask():
    faces = np.array([[0, 1, 2], [2, 3, 4], [5, 6, 7]], np.int32)
    adj = build_adjacency_mask(faces)
    assert adj[0, 0] and adj[0, 1] and adj[1, 0]  # share vertex 2
    assert not adj[0, 2] and not adj[1, 2]


def test_two_stage_topk_matches_bruteforce(rng):
    """The broad phase's two-stage row-max selection must return the same
    intersecting-pair set as a brute-force all-pairs SAT, even with many
    candidates clustered in few rows (the adversarial case for row-based
    pruning)."""
    from ev2hands_tpu.ops.collision import find_collision_pairs, tri_tri_intersect

    # a dense cluster of overlapping triangles plus far-away isolated ones
    T = 64
    centers = np.concatenate([
        rng.randn(16, 3) * 0.01,          # tight cluster: many overlaps
        rng.randn(T - 16, 3) * 10.0,      # scattered: few overlaps
    ])
    tris = jnp.asarray(
        centers[:, None, :] + rng.randn(T, 3, 3) * 0.05, jnp.float32
    )
    adjacency = jnp.zeros((T, T), bool)

    cp = find_collision_pairs(tris, adjacency, max_pairs=128)
    got = {
        (int(a), int(b))
        for (a, b), hit in zip(np.asarray(cp.pairs), np.asarray(cp.intersecting))
        if hit
    }

    ref = set()
    tn = np.asarray(tris)
    for a in range(T):
        for b in range(a + 1, T):
            if bool(tri_tri_intersect(tris[a], tris[b])):
                ref.add((a, b))
    # capacity is ample here, so the sets must match exactly
    assert len(ref) <= 128
    assert got == ref

    # and with R = 2*max_pairs < T, so the row pruning actually engages:
    # scattered triangles, few overlaps, capacity ample
    T2 = 256
    centers2 = rng.randn(T2, 3) * 1.2
    tris2 = jnp.asarray(
        centers2[:, None, :] + rng.randn(T2, 3, 3) * 0.08, jnp.float32
    )
    cp2 = find_collision_pairs(tris2, jnp.zeros((T2, T2), bool), max_pairs=64)
    got2 = {
        (int(a), int(b))
        for (a, b), hit in zip(np.asarray(cp2.pairs), np.asarray(cp2.intersecting))
        if hit
    }
    ref2 = set()
    for a in range(T2):
        ta = tris2[a]
        hits = np.asarray(tri_tri_intersect(
            jnp.broadcast_to(ta, (T2, 3, 3)), tris2))
        for b in range(a + 1, T2):
            if hits[b]:
                ref2.add((a, b))
    assert len(ref2) <= 64, "fixture produced too many overlaps"
    assert got2 == ref2
