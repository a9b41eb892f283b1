"""MANO layer tests against an independent numpy oracle.

The oracle below re-derives the MANO forward (PCA pose -> blend shapes ->
forward kinematics -> LBS -> 21 joints) directly from the model definition,
with a deliberately different implementation style (explicit loops, homogeneous
matrices built by hand) so a shared bug in the JAX path can't hide.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ev2hands_tpu.mano import (
    JOINT_REORDER,
    KINTREE_PARENTS,
    mano_forward,
    rodrigues,
    synthetic_mano_models,
)
from ev2hands_tpu.mano.model_data import apply_shapedirs_fix


def _rodrigues_np(rv):
    theta = np.linalg.norm(rv)
    if theta < 1e-12:
        return np.eye(3)
    k = rv / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def mano_oracle(data, global_orient, hand_pose, betas, transl, n_comps=6):
    """Reference numpy implementation of the MANO forward pass."""
    full_pose = data.hands_mean + hand_pose @ data.hands_components[:n_comps]
    pose = np.concatenate([global_orient, full_pose]).reshape(16, 3)
    R = np.stack([_rodrigues_np(pose[i]) for i in range(16)])

    v_shaped = data.v_template + data.shapedirs @ betas
    J = data.J_regressor @ v_shaped

    pose_feat = (R[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + (data.posedirs.reshape(-1, 135) @ pose_feat).reshape(-1, 3)

    # FK
    G = np.zeros((16, 4, 4))
    for k in range(16):
        p = KINTREE_PARENTS[k]
        T = np.eye(4)
        T[:3, :3] = R[k]
        T[:3, 3] = J[k] - (J[p] if p >= 0 else 0)
        G[k] = T if p < 0 else G[p] @ T

    joints = G[:, :3, 3].copy()

    A = G.copy()
    for k in range(16):
        A[k, :3, 3] -= A[k, :3, :3] @ J[k]

    T = np.einsum("vk,kij->vij", data.lbs_weights, A)
    vh = np.concatenate([v_posed, np.ones((v_posed.shape[0], 1))], -1)
    verts = np.einsum("vij,vj->vi", T, vh)[:, :3]

    tips = verts[data.tip_vertex_ids]
    j21 = np.concatenate([joints, tips])[JOINT_REORDER]
    return verts + transl, j21 + transl


@pytest.mark.parametrize("side", ["left", "right"])
def test_mano_matches_oracle(mano_models, mano_hands, rng, side):
    data = mano_models[side]
    hand = mano_hands[side]

    go = rng.randn(3).astype(np.float32) * 0.5
    hp = rng.randn(6).astype(np.float32) * 1.5
    bt = rng.randn(10).astype(np.float32)
    tr = rng.randn(3).astype(np.float32) * 0.1

    out = hand(jnp.asarray(go), jnp.asarray(hp), jnp.asarray(bt), jnp.asarray(tr))
    v_ref, j_ref = mano_oracle(data, go, hp, bt, tr)

    np.testing.assert_allclose(np.asarray(out.vertices), v_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.joints), j_ref, atol=2e-5)
    assert out.vertices.shape == (778, 3)
    assert out.joints.shape == (21, 3)


def test_mano_batched_and_jit(mano_hands, rng):
    hand = mano_hands["right"]
    B = 4
    go = jnp.asarray(rng.randn(B, 3), jnp.float32)
    hp = jnp.asarray(rng.randn(B, 6), jnp.float32)
    bt = jnp.asarray(rng.randn(B, 10), jnp.float32)
    tr = jnp.asarray(rng.randn(B, 3), jnp.float32)

    fn = jax.jit(lambda *a: mano_forward(hand.params, *a))
    out = fn(go, hp, bt, tr)
    assert out.vertices.shape == (B, 778, 3)
    assert out.joints.shape == (B, 21, 3)

    # batched result equals per-sample results
    single = hand(go[1], hp[1], bt[1], tr[1])
    np.testing.assert_allclose(np.asarray(out.vertices[1]), np.asarray(single.vertices), atol=1e-5)


def test_mano_zero_pose_is_mean_shifted_template(mano_models, mano_hands):
    """With betas=0, pose PCA=0 and zero rotation the fingers still take the
    hands_mean pose (flat_hand_mean=False); only with hands_mean zeroed does
    the output equal the template."""
    data = mano_models["right"]
    data2 = type(data)(**{**data.__dict__, "hands_mean": np.zeros(45, np.float32)})
    from ev2hands_tpu.mano import ManoHand

    hand = ManoHand(data2, n_pose_comps=6)
    zero = jnp.zeros
    out = hand(zero(3), zero(6), zero(10), zero(3))
    np.testing.assert_allclose(np.asarray(out.vertices), data2.v_template, atol=1e-5)


def test_mano_differentiable(mano_hands):
    hand = mano_hands["right"]

    def loss(hp):
        out = hand(jnp.zeros(3), hp, jnp.zeros(10), jnp.zeros(3))
        return jnp.sum(out.joints**2)

    g = jax.grad(loss)(jnp.ones(6) * 0.1)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_rodrigues_matches_scipy(rng):
    from scipy.spatial.transform import Rotation as R

    rv = rng.randn(32, 3) * 2.0
    ours = np.asarray(rodrigues(jnp.asarray(rv, jnp.float32)))
    ref = R.from_rotvec(rv).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_shapedirs_fix_detection():
    models = synthetic_mano_models(seed=3)
    left, right = models["left"], models["right"]
    # synthetic models share shapedirs -> the released-asset bug pattern
    assert apply_shapedirs_fix(left, right)
    # after the fix the first column differs by sign
    np.testing.assert_allclose(left.shapedirs[:, 0, :], -right.shapedirs[:, 0, :])
    # applying to already-fixed data is a no-op
    assert not apply_shapedirs_fix(left, right)
