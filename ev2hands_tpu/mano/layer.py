"""Pure-JAX differentiable MANO hand layer.

TPU-native replacement for the reference's ``manopth.ManoLayer`` adapter
(``src/Ev2Hands/model/utils.py:13-42``): PCA pose space (``ncomps``
components, ``flat_hand_mean=False``), shape blend shapes, pose-corrective
blend shapes, linear blend skinning, 16 regressed joints + 5 fingertip
vertices reordered into the standard 21-joint layout. Outputs are in meters
(manopth returns millimeters and the reference adapter divides by 1000 at
``model/utils.py:28-29``; here we just never leave meters).

Everything is a fixed-shape jittable function of a ``ManoParams`` pytree so a
two-hand forward (and its gradients, inside the training step) fuses into the
surrounding XLA program.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ev2hands_tpu.mano.model_data import (
    JOINT_REORDER,
    KINTREE_PARENTS,
    ManoModelData,
)


class ManoParams(NamedTuple):
    """Device-resident constants of one MANO hand (a jit-friendly pytree)."""

    v_template: jax.Array       # [V, 3]
    shapedirs: jax.Array        # [V, 3, 10]
    posedirs: jax.Array         # [V*3, 135] flattened pose blend shapes
    J_regressor: jax.Array      # [16, V]
    lbs_weights: jax.Array      # [V, 16]
    pose_basis: jax.Array       # [ncomps, 45] selected PCA components
    hands_mean: jax.Array       # [45]
    tip_ids: jax.Array          # [5] int32
    faces: jax.Array            # [F, 3] int32
    is_left: jax.Array          # scalar bool (metadata only)


class ManoOutput(NamedTuple):
    vertices: jax.Array  # [..., 778, 3] meters
    joints: jax.Array    # [..., 21, 3] meters


def create_mano_params(data: ManoModelData, n_pose_comps: int = 6) -> ManoParams:
    return ManoParams(
        v_template=jnp.asarray(data.v_template),
        shapedirs=jnp.asarray(data.shapedirs),
        posedirs=jnp.asarray(data.posedirs.reshape(-1, data.posedirs.shape[-1])),
        J_regressor=jnp.asarray(data.J_regressor),
        lbs_weights=jnp.asarray(data.lbs_weights),
        pose_basis=jnp.asarray(data.hands_components[:n_pose_comps]),
        hands_mean=jnp.asarray(data.hands_mean),
        tip_ids=jnp.asarray(data.tip_vertex_ids, jnp.int32),
        faces=jnp.asarray(data.faces, jnp.int32),
        is_left=jnp.asarray(data.side == "left"),
    )


def rodrigues(rotvec: jax.Array) -> jax.Array:
    """Batched axis-angle -> rotation matrix, [..., 3] -> [..., 3, 3].

    Smooth at the origin (uses the quaternion form like the reference's
    ``batch_rodrigues`` at ``losses.py:37-51``), so gradients through small
    rotations are well-defined.
    """
    angle = jnp.sqrt(jnp.sum(rotvec**2, axis=-1, keepdims=True) + 1e-16)
    half = angle * 0.5
    axis = rotvec / angle
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_rotmat(quat)


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """[..., 4] (w, x, y, z) unit quaternion -> [..., 3, 3]."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = (quat[..., i] for i in range(4))
    r = jnp.stack(
        [
            w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (w * y + x * z),
            2 * (w * z + x * y), w * w - x * x + y * y - z * z, 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (w * x + y * z), w * w - x * x - y * y + z * z,
        ],
        axis=-1,
    )
    return r.reshape(*quat.shape[:-1], 3, 3)


def _rigid_transform_chain(rot_mats: jax.Array, joints: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Forward kinematics along the MANO tree.

    Args:
      rot_mats: [16, 3, 3] local joint rotations (root first).
      joints:   [16, 3] rest-pose joint locations.

    Returns:
      posed_joints: [16, 3] world-space joint locations.
      rel_transforms: [16, 4, 4] skinning transforms with the rest pose
        removed (G_k @ inv(rest translation)).
    """
    parents = KINTREE_PARENTS

    def make_T(R, t):
        T = jnp.zeros((4, 4)).at[:3, :3].set(R).at[:3, 3].set(t).at[3, 3].set(1.0)
        return T

    rel_pos = joints - jnp.where(
        (parents >= 0)[:, None], joints[jnp.maximum(parents, 0)], 0.0
    )

    # The chain is a fixed 16-node tree: unrolled python loop traces to a
    # static XLA graph (no dynamic control flow).
    transforms = [make_T(rot_mats[0], rel_pos[0])]
    for k in range(1, len(parents)):
        transforms.append(transforms[parents[k]] @ make_T(rot_mats[k], rel_pos[k]))
    G = jnp.stack(transforms)  # [16, 4, 4]

    posed_joints = G[:, :3, 3]
    # Remove rest pose: A_k = G_k - pack(G_k[:3,:3] @ J_k)
    correction = jnp.einsum("kij,kj->ki", G[:, :3, :3], joints)
    rel = G.at[:, :3, 3].add(-correction)
    return posed_joints, rel


def mano_forward(
    params: ManoParams,
    global_orient: jax.Array,  # [..., 3] axis-angle root rotation
    hand_pose: jax.Array,      # [..., ncomps] PCA pose coefficients
    betas: jax.Array,          # [..., 10] shape
    transl: jax.Array,         # [..., 3] translation (meters)
) -> ManoOutput:
    """Differentiable MANO forward. Accepts arbitrary leading batch dims."""
    batch_shape = global_orient.shape[:-1]
    if batch_shape:
        flat = lambda a: a.reshape((-1,) + a.shape[len(batch_shape):])
        out = jax.vmap(_mano_forward_single, in_axes=(None, 0, 0, 0, 0))(
            params, flat(global_orient), flat(hand_pose), flat(betas), flat(transl)
        )
        return ManoOutput(
            vertices=out.vertices.reshape(batch_shape + out.vertices.shape[1:]),
            joints=out.joints.reshape(batch_shape + out.joints.shape[1:]),
        )
    return _mano_forward_single(params, global_orient, hand_pose, betas, transl)


def _mano_forward_single(
    params: ManoParams,
    global_orient: jax.Array,
    hand_pose: jax.Array,
    betas: jax.Array,
    transl: jax.Array,
) -> ManoOutput:
    V = params.v_template.shape[0]
    # Millimeter-level geometry: keep all contractions in full fp32 even on
    # TPU (whose default matmul precision is bfloat16). These matmuls are
    # tiny next to the network convs, so HIGHEST precision costs nothing.
    hi = jax.lax.Precision.HIGHEST

    # PCA -> full 45-dim axis-angle finger pose, plus the (non-flat) mean.
    full_finger_pose = params.hands_mean + jnp.einsum(
        "c,cp->p", hand_pose, params.pose_basis, precision=hi
    )
    pose = jnp.concatenate([global_orient, full_finger_pose]).reshape(16, 3)
    rot_mats = rodrigues(pose)  # [16, 3, 3]

    # Shape blend shapes.
    v_shaped = params.v_template + jnp.einsum(
        "vcs,s->vc", params.shapedirs, betas, precision=hi
    )
    joints_rest = jnp.einsum("jv,vc->jc", params.J_regressor, v_shaped, precision=hi)

    # Pose-corrective blend shapes from the 15 finger rotations.
    pose_feature = (rot_mats[1:] - jnp.eye(3)).reshape(-1)  # [135]
    v_posed = v_shaped + jnp.einsum(
        "vp,p->v", params.posedirs, pose_feature, precision=hi
    ).reshape(V, 3)

    joints, rel_transforms = _rigid_transform_chain(rot_mats, joints_rest)

    # Linear blend skinning.
    T = jnp.einsum("vk,kij->vij", params.lbs_weights, rel_transforms, precision=hi)
    v_hom = jnp.concatenate([v_posed, jnp.ones((V, 1))], axis=-1)
    verts = jnp.einsum("vij,vj->vi", T, v_hom, precision=hi)[:, :3]

    # Append fingertip vertices and reorder to the 21-joint layout.
    tips = verts[params.tip_ids]
    joints21 = jnp.concatenate([joints, tips], axis=0)[JOINT_REORDER]

    verts = verts + transl
    joints21 = joints21 + transl
    return ManoOutput(vertices=verts, joints=joints21)


class ManoHand:
    """Convenience wrapper bundling params + faces for one hand."""

    def __init__(self, data: ManoModelData, n_pose_comps: int = 6):
        self.side = data.side
        self.params = create_mano_params(data, n_pose_comps)
        self.faces = np.asarray(data.faces, np.int64)
        self.n_pose_comps = n_pose_comps

    def __call__(self, global_orient, hand_pose, betas, transl) -> ManoOutput:
        return mano_forward(self.params, global_orient, hand_pose, betas, transl)


def create_mano_hands(models: Dict[str, ManoModelData], n_pose_comps: int = 6) -> Dict[str, ManoHand]:
    """Build both hands (mirrors ``create_mano_layers`` at
    ``model/utils.py:13-42``; the shapedirs fix is applied at load time in
    ``model_data.load_mano_models``)."""
    return {side: ManoHand(m, n_pose_comps) for side, m in models.items()}
