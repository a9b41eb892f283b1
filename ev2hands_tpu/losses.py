"""Training loss suite as pure jittable functions.

Re-design of the reference's ``Loss`` nn.Module (``src/Ev2Hands/losses.py``).
Two static variants, selected by the dataset type on the host (the reference
branches on ``mean(targets['mano_gt'])`` at runtime, ``losses.py:145-151`` —
a per-batch constant, so it is a compile-time switch here):

  * ``mano_losses``  — synthetic Ev2Hands-S batches with full MANO GT
    (``losses.py:153-206``)
  * ``real_losses``  — Ev2Hands-R batches with only j3d/j2d GT
    (``losses.py:208-240``)

Faithfully reproduced quirks (documented, not accidental):
  * The reference's "regularizer" in MANO mode computes ``mse(x, x) == 0``
    (``losses.py:200-201``) — an effective no-op. We expose a real L2
    regularizer whose default weight 0.0 matches the effective reference.
  * In real mode the running ``regularizer_loss`` is multiplied by 0.025
    inside the per-hand loop (``losses.py:234``), i.e. the left hand's term
    is scaled twice: total = 0.025*(0.025*reg_L + reg_R). Reproduced.

All masked reductions follow ``index_losss`` (``losses.py:128-142``): mean
over the elements of valid samples; zero when no sample is valid.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ev2hands_tpu.camera import opengl_projection_transform
from ev2hands_tpu.config import LossConfig
from ev2hands_tpu.mano.layer import ManoParams, mano_forward
from ev2hands_tpu.ops.collision import collision_loss


def masked_mean(elem_loss: jax.Array, valid: jax.Array) -> jax.Array:
    """Mean over all elements of samples where ``valid`` (float/bool [B]);
    0 if none valid (reference ``index_losss``, ``losses.py:128-142``)."""
    B = elem_loss.shape[0]
    flat = elem_loss.reshape(B, -1)
    v = valid.reshape(B, 1).astype(flat.dtype)
    denom = jnp.sum(v) * flat.shape[1]
    return jnp.where(denom > 0, jnp.sum(flat * v) / jnp.maximum(denom, 1.0), 0.0)


def mse(a, b):
    return (a - b) ** 2


def l1(a, b):
    return jnp.abs(a - b)


def weighted_cross_entropy(
    logits: jax.Array,   # [B, N, C]
    targets: jax.Array,  # [B, N] int
    class_weights: jax.Array,  # [C]
    ignore_index: int = 0,
) -> jax.Array:
    """torch ``F.cross_entropy(weight=..., ignore_index=...)`` semantics:
    sum(w[y]*nll) / sum(w[y]) over non-ignored targets (``losses.py:203``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    w = class_weights[targets] * (targets != ignore_index)
    denom = jnp.sum(w)
    return jnp.where(denom > 0, jnp.sum(w * nll) / jnp.maximum(denom, 1.0), 0.0)


class CollisionContext(NamedTuple):
    """Static mesh topology for the collision loss."""

    faces: jax.Array      # [2F, 3] combined two-hand faces
    adjacency: jax.Array  # [2F, 2F] bool


def _interpen(outputs, ctx: CollisionContext, cfg: LossConfig) -> jax.Array:
    return collision_loss(
        outputs["left"]["vertices"],
        outputs["right"]["vertices"],
        ctx.faces,
        ctx.adjacency,
        max_pairs=cfg.collision_max_pairs,
        sigma=cfg.collision_sigma,
        weight=cfg.collision_weight,
    )


def recompute_gt_joints(
    hands: Dict[str, ManoParams], targets: Dict
) -> Dict:
    """Push GT MANO params through the MANO layer to get GT joints/vertices
    (``losses.py:157-164``); hand_pose GT may carry more PCA components than
    the layer uses — extra components are ignored (manopth slices)."""
    out = dict(targets)
    for side in ("left", "right"):
        t = targets[side]
        res = mano_forward(
            hands[side],
            t["global_orient"],
            t["hand_pose"][..., : hands[side].pose_basis.shape[0]],
            t["shape"],
            t["trans"],
        )
        out[side] = dict(t, j3d=res.joints, vertices=res.vertices)
    return out


def mano_losses(
    outputs: Dict,
    targets: Dict,
    hands: Dict[str, ManoParams],
    ctx: CollisionContext,
    cfg: LossConfig = LossConfig(),
    n_pose_comps: int = 6,
    reg_weight: float = 0.0,
) -> Dict[str, jax.Array]:
    """Synthetic-data loss dict (``losses.py:153-206``). ``outputs`` is the
    TEHNet+MANO forward result; ``targets`` the batch dict."""
    losses: Dict[str, jax.Array] = {}
    targets = recompute_gt_joints(hands, targets)

    losses["loss_interpen"] = _interpen(outputs, ctx, cfg)

    interacting = (jnp.sum(targets["handedness"], axis=1) == 2)

    losses["loss_inter_shape"] = masked_mean(
        mse(outputs["left"]["betas"], outputs["right"]["betas"]), interacting
    )
    losses["loss_inter_transl"] = masked_mean(
        mse(
            outputs["left"]["transl"] - outputs["right"]["transl"],
            targets["left"]["trans"] - targets["right"]["trans"],
        ),
        interacting,
    ) * 100.0
    losses["loss_inter_j3d"] = masked_mean(
        mse(
            outputs["left"]["j3d"] - outputs["right"]["j3d"],
            targets["left"]["j3d"] - targets["right"]["j3d"],
        ),
        interacting,
    ) * 100.0

    for k in (
        "loss_global_orient", "loss_hand_pose", "loss_rj3d", "loss_j3d",
        "loss_shape", "loss_transl", "regularizer_loss",
    ):
        losses.setdefault(k, 0.0)

    for side in ("left", "right"):
        o, t = outputs[side], targets[side]
        valid = t["valid"]

        losses["loss_global_orient"] += masked_mean(
            mse(o["global_orient"], t["global_orient"]), valid
        ) * 10.0
        gt_pose = t["hand_pose"][..., :n_pose_comps]
        losses["loss_hand_pose"] += masked_mean(mse(o["hand_pose"], gt_pose), valid) * 10.0

        rj_o = (o["j3d"][:, 1:, :] - o["j3d"][:, :1, :]) * 1000.0
        rj_t = (t["j3d"][:, 1:, :] - t["j3d"][:, :1, :]) * 1000.0
        losses["loss_rj3d"] += masked_mean(l1(rj_o, rj_t), valid) * 0.01
        losses["loss_j3d"] += masked_mean(
            l1(o["j3d"] * 1000.0, t["j3d"] * 1000.0), valid
        ) * 0.01

        losses["loss_shape"] += masked_mean(mse(o["betas"], t["shape"]), valid) * 10.0
        losses["loss_transl"] += masked_mean(l1(o["transl"], t["trans"]), valid) * 10.0

        # The reference's regularizer here is mse(x, x) == 0 (a no-op);
        # reg_weight=0 reproduces it, >0 gives the intended L2 penalty.
        losses["regularizer_loss"] += reg_weight * (
            0.1 * masked_mean(o["betas"] ** 2, valid)
            + masked_mean(o["hand_pose"] ** 2, valid)
        )

    losses["loss_class_logits"] = weighted_cross_entropy(
        outputs["class_logits"],
        targets["class_logits"],
        jnp.asarray(cfg.ce_class_weights),
        cfg.ce_ignore_index,
    )
    return losses


def real_losses(
    outputs: Dict,
    targets: Dict,
    ctx: CollisionContext,
    projection_matrix: jax.Array,
    width: int,
    height: int,
    cfg: LossConfig = LossConfig(),
) -> Dict[str, jax.Array]:
    """Real-data loss dict (``losses.py:208-240``): no MANO GT; supervision is
    root-relative j3d + 2-D reprojection + inter-hand consistency."""
    losses: Dict[str, jax.Array] = {}

    losses["loss_interpen"] = _interpen(outputs, ctx, cfg)

    interacting = (jnp.sum(targets["handedness"], axis=1) == 2)

    losses["loss_inter_shape"] = masked_mean(
        mse(outputs["left"]["betas"], outputs["right"]["betas"]), interacting
    ) * 1e3
    losses["loss_inter_j3d"] = masked_mean(
        l1(
            (outputs["left"]["j3d"] - outputs["right"]["j3d"]) * 1000.0,
            (targets["left"]["j3d"] - targets["right"]["j3d"]) * 1000.0,
        ),
        interacting,
    )

    losses["loss_rj3d"] = 0.0
    losses["loss_j2d"] = 0.0
    reg = 0.0
    for side in ("left", "right"):
        o, t = outputs[side], targets[side]
        valid = t["valid"]

        # Reference quirk: the running regularizer is scaled by 0.025 inside
        # the loop, double-scaling the left hand (``losses.py:231-234``).
        reg = (reg + jnp.mean(o["betas"] ** 2) * 1e3 + jnp.mean(o["hand_pose"] ** 2)) * 0.025

        rj_o = (o["j3d"][:, 1:, :] - o["j3d"][:, :1, :]) * 1000.0
        rj_t = (t["j3d"][:, 1:, :] - t["j3d"][:, :1, :]) * 1000.0
        losses["loss_rj3d"] += masked_mean(l1(rj_o, rj_t), valid) * 10.0

        j2d_pred = opengl_projection_transform(
            projection_matrix, width, height, o["j3d"] * 1000.0
        )
        losses["loss_j2d"] += masked_mean(mse(j2d_pred, t["j2d"][..., :2]), valid)

    losses["regularizer_loss"] = reg
    return losses


def total_loss(losses: Dict[str, jax.Array]) -> jax.Array:
    """Sum of all loss terms (``train.py:86``)."""
    return sum(jnp.asarray(v) for v in losses.values())
