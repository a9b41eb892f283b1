"""Loss + metric tests: masked-mean semantics vs torch's index_loss behavior,
weighted CE vs torch F.cross_entropy, PCK/AUC oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ev2hands_tpu.config import LossConfig
from ev2hands_tpu.losses import (
    CollisionContext,
    mano_losses,
    masked_mean,
    real_losses,
    total_loss,
    weighted_cross_entropy,
)
from ev2hands_tpu.metrics import (
    PckAccumulator,
    absolute_pck3d,
    get_auc,
    mpjpe,
    relative_pck3d,
    right_root_relative_pck3d,
)
from ev2hands_tpu.ops.collision import build_adjacency_mask, build_two_hand_faces


def test_masked_mean_matches_reference_semantics(rng):
    # index_losss: loss*mask summed / (sum(mask)*D)
    x = rng.randn(4, 5).astype(np.float32)
    y = rng.randn(4, 5).astype(np.float32)
    mask = np.array([1, 0, 1, 0], np.float32)
    got = float(masked_mean(jnp.asarray((x - y) ** 2), jnp.asarray(mask)))

    loss = F.mse_loss(torch.from_numpy(x), torch.from_numpy(y), reduction="none")
    ind = torch.from_numpy(mask)[:, None].repeat(1, 5)
    ref = (loss * ind).sum() / ind.sum()
    np.testing.assert_allclose(got, float(ref), rtol=1e-6)


def test_masked_mean_all_invalid():
    x = jnp.ones((3, 4))
    assert float(masked_mean(x, jnp.zeros(3))) == 0.0


def test_weighted_ce_matches_torch(rng):
    B, N, C = 2, 64, 4
    logits = rng.randn(B, N, C).astype(np.float32)
    targets = rng.randint(0, C, (B, N))
    w = np.array([1, 30, 30, 10], np.float32)

    got = float(
        weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w), ignore_index=0
        )
    )
    ref = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 2, 1),
        torch.from_numpy(targets),
        weight=torch.from_numpy(w),
        ignore_index=0,
    )
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)


def _fake_outputs_targets(rng, mano_hands, B=2):
    hands = {s: h.params for s, h in mano_hands.items()}
    faces = {s: np.asarray(mano_hands[s].faces) for s in ("left", "right")}

    def hand_params(key_shift):
        return {
            "global_orient": jnp.asarray(rng.randn(B, 3) * 0.1, jnp.float32),
            "hand_pose": jnp.asarray(rng.randn(B, 6) * 0.1, jnp.float32),
            "betas": jnp.asarray(rng.randn(B, 10) * 0.1, jnp.float32),
            "transl": jnp.asarray(rng.randn(B, 3) * 0.05 + key_shift, jnp.float32),
        }

    from ev2hands_tpu.model.tehnet import apply_mano

    outputs = {
        "class_logits": jnp.asarray(rng.randn(B, 128, 4), jnp.float32),
        "left": hand_params(-0.3),
        "right": hand_params(0.3),
    }
    outputs = apply_mano(hands, outputs)

    targets = {
        "class_logits": jnp.asarray(rng.randint(0, 4, (B, 128)), jnp.int32),
        "handedness": jnp.asarray(np.ones((B, 2)), jnp.int32),
        "left": {
            "global_orient": jnp.zeros((B, 3)),
            "hand_pose": jnp.zeros((B, 45)),
            "shape": jnp.zeros((B, 10)),
            "trans": jnp.full((B, 3), -0.3),
            "valid": jnp.ones((B,), jnp.float32),
            "j3d": jnp.zeros((B, 21, 3)),
            "j2d": jnp.zeros((B, 21, 3)),
        },
        "right": {
            "global_orient": jnp.zeros((B, 3)),
            "hand_pose": jnp.zeros((B, 45)),
            "shape": jnp.zeros((B, 10)),
            "trans": jnp.full((B, 3), 0.3),
            "valid": jnp.ones((B,), jnp.float32),
            "j3d": jnp.zeros((B, 21, 3)),
            "j2d": jnp.zeros((B, 21, 3)),
        },
    }

    two_faces = build_two_hand_faces(faces["left"], faces["right"])
    ctx = CollisionContext(
        faces=jnp.asarray(two_faces),
        adjacency=jnp.asarray(build_adjacency_mask(two_faces)),
    )
    return hands, outputs, targets, ctx


def test_mano_losses_structure(rng, mano_hands):
    hands, outputs, targets, ctx = _fake_outputs_targets(rng, mano_hands)
    losses = mano_losses(outputs, targets, hands, ctx)
    expected = {
        "loss_interpen", "loss_inter_shape", "loss_inter_transl", "loss_inter_j3d",
        "loss_global_orient", "loss_hand_pose", "loss_rj3d", "loss_j3d",
        "loss_shape", "loss_transl", "regularizer_loss", "loss_class_logits",
    }
    assert set(losses) == expected
    tot = float(total_loss(losses))
    assert np.isfinite(tot) and tot > 0
    # default regularizer reproduces the reference's effective no-op
    assert float(losses["regularizer_loss"]) == 0.0


def test_mano_losses_differentiable(rng, mano_hands):
    hands, outputs, targets, ctx = _fake_outputs_targets(rng, mano_hands)

    def f(transl):
        o = dict(outputs)
        o["left"] = dict(outputs["left"], transl=transl)
        from ev2hands_tpu.model.tehnet import apply_mano
        o = apply_mano(hands, {k: o[k] for k in ("class_logits", "left", "right")})
        return total_loss(mano_losses(o, targets, hands, ctx))

    g = jax.grad(f)(outputs["left"]["transl"])
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0


def test_real_losses_structure(rng, mano_hands):
    hands, outputs, targets, ctx = _fake_outputs_targets(rng, mano_hands)
    proj = jnp.asarray(np.eye(4), jnp.float32)
    losses = real_losses(outputs, targets, ctx, proj, 346, 260)
    expected = {
        "loss_interpen", "loss_inter_shape", "loss_inter_j3d",
        "loss_rj3d", "loss_j2d", "regularizer_loss",
    }
    assert set(losses) == expected
    assert np.isfinite(float(total_loss(losses)))


def test_invalid_hand_masks_losses(rng, mano_hands):
    hands, outputs, targets, ctx = _fake_outputs_targets(rng, mano_hands)
    targets["left"] = dict(targets["left"], valid=jnp.zeros((2,)))
    targets["handedness"] = jnp.asarray([[0, 1], [0, 1]])
    losses = mano_losses(outputs, targets, hands, ctx)
    # inter-hand terms vanish when not interacting
    assert float(losses["loss_inter_shape"]) == 0.0
    assert float(losses["loss_inter_j3d"]) == 0.0


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def _pck_oracle(pred, gt, num_steps, dmax):
    d = np.linalg.norm(pred.reshape(-1, 3) - gt.reshape(-1, 3), axis=1)
    return np.array([(d < dmax / num_steps * s).mean() for s in range(num_steps + 1)])


def test_absolute_pck_oracle(rng):
    pred = rng.randn(2, 21, 3).astype(np.float32) * 20
    gt = pred + rng.randn(2, 21, 3).astype(np.float32) * 10
    got = np.asarray(absolute_pck3d(jnp.asarray(pred), jnp.asarray(gt)))
    ref = _pck_oracle(pred, gt, 50, 50.0)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_relative_pck_root_invariance(rng):
    pred = rng.randn(2, 21, 3).astype(np.float32) * 20
    gt = pred + rng.randn(2, 21, 3).astype(np.float32) * 5
    a = relative_pck3d(jnp.asarray(pred), jnp.asarray(gt))
    b = relative_pck3d(jnp.asarray(pred + 100.0), jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_right_root_relative_pck(rng):
    pred = rng.randn(2, 21, 3).astype(np.float32) * 20
    gt = pred.copy()
    out = np.asarray(right_root_relative_pck3d(jnp.asarray(pred), jnp.asarray(gt)))
    assert out[-1] == 1.0  # identical joints: everything within max threshold


def test_mpjpe_zero_for_identical(rng):
    j = jnp.asarray(rng.randn(2, 21, 3), jnp.float32)
    assert float(mpjpe(j, j)) == 0.0


def test_get_auc_matches_sklearn():
    from sklearn import metrics as skm

    pck = np.linspace(0, 1, 51) ** 0.5
    ref = round(skm.auc(range(51), pck) / 51, 2)
    assert get_auc(pck) == ref


def test_accumulator(rng):
    acc = PckAccumulator()
    pred = jnp.asarray(rng.randn(4, 2, 21, 3) * 20, jnp.float32)
    gt = pred + jnp.asarray(rng.randn(4, 2, 21, 3) * 5, jnp.float32)
    acc.update(pred, gt)
    acc.update(pred, gt)
    metrics, score = acc.result()
    assert acc.frames == 8
    assert 0 <= score <= 1
    assert metrics["pck3d"]["relative"].shape == (51,)
