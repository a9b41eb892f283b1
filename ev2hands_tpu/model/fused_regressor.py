"""Fused two-hand MANO regressor for the inference path.

The reference runs two structurally identical ``MANORegressor`` heads
sequentially (``TEHNet.py:194-195``), each re-doing FPS and the radius
queries over the SAME event positions.  On TPU the better program is one
h-stacked pass:

  * FPS and the in-radius/first-K selection masks depend only on ``xyz`` —
    computed ONCE and shared by both hands;
  * every Dense/BN layer of the two heads is stacked along a leading
    ``h=2`` axis and evaluated as one batched matmul (bigger MXU tiles,
    half the kernel dispatches);
  * eval-mode BatchNorm folds into the Dense weights (pure function), as in
    the event-sharded path.

Numerics are identical to running the two flax heads separately in eval
mode (tested in ``test_model.py::test_fused_regressor_matches_separate``).
Only active at apply time (params must exist) in the dense eval path; the
flax modules remain the source of truth for the parameter tree, training,
and checkpoint layout.

STATUS (TPU v5e, jax 0.9): measured SLOWER than the separate heads — full
pipeline 280 vs 315 windows/s at B=32, bare forward 2331 vs 2622 w/s —
despite ~1% fewer analytic FLOPs (shared FPS/distances).  The h-batched
``dot_general`` tiles worse on the MXU than the two unbatched dots XLA
emits for the separate heads, and XLA already CSEs the hand-independent
FPS/distance subgraphs.  Kept as a correct, tested option
(``ModelConfig.fused_regressors``), default off.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ev2hands_tpu.ops.pallas_ops import fps_auto
from ev2hands_tpu.ops.pointnet import index_points, square_distance
from ev2hands_tpu.parallel.event_parallel import fold_bn_dense

SIDES = ("left_mano_regressor", "right_mano_regressor")

# Regressor architecture constants (must mirror ManoRegressor in tehnet.py;
# the centroid count is the shared constant so a change there propagates)
from ev2hands_tpu.model.tehnet import REGRESSOR_NPOINT as _NPOINT  # noqa: E402
_RADII = (0.4, 0.8)
_NSAMPLE = (64, 128)
_MLPS = ((128, 128, 256), (128, 196, 256))
_SA2_MLP = (256, 512)


def _fold(params: Dict, stats: Dict, conv: str, bn: str):
    c, b, s = params[conv], params[bn], stats[bn]
    return fold_bn_dense(
        c["kernel"], c["bias"], b["scale"], b["bias"], s["mean"], s["var"]
    )


def _stacked(params: Dict, stats: Dict, conv: str, bn: str):
    """Fold BN into Dense for both hands and stack along a leading h axis."""
    ws, bs_ = [], []
    for side in SIDES:
        W, b = _fold(params[side], stats[side], conv, bn)
        ws.append(W)
        bs_.append(b)
    return jnp.stack(ws), jnp.stack(bs_)


def fused_two_hand_regressor(
    variables: Dict,
    xyz: jax.Array,            # [B, N, 3] shared event positions
    features_left: jax.Array,  # [B, N, 4] per-hand attention features
    features_right: jax.Array,
    n_pose_params: int = 6,
    n_shape_params: int = 10,
    s_chunk: int = 16,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Both regressor heads in one h-stacked pass. ``variables`` is the
    TEHNet-scope variable dict (contains the two regressor subtrees)."""
    p, st = variables["params"], variables["batch_stats"]
    hp = jax.lax.Precision.HIGHEST

    feats = jnp.stack([features_left, features_right])  # [2, B, N, 4]
    B, N, _ = xyz.shape
    S = _NPOINT

    # --- shared geometry: FPS + per-scale first-K in-radius selection -----
    fps_idx = fps_auto(xyz, S, key=None)
    new_xyz = index_points(xyz, fps_idx)                 # [B, S, 3]
    d2 = square_distance(new_xyz, xyz)                   # [B, S, N]
    sels = []
    for radius, k in zip(_RADII, _NSAMPLE):
        mask = d2 <= radius * radius
        rank = jnp.cumsum(mask, axis=-1) - mask
        sel = mask & (rank < k)
        empty = ~jnp.any(mask, axis=-1)
        sels.append(sel | (empty[..., None] & (jnp.arange(N) == 0)))

    p_sa1 = {s: p[s]["sa1"] for s in SIDES}
    st_sa1 = {s: st[s]["sa1"] for s in SIDES}
    p_sa2 = {s: p[s]["sa2"] for s in SIDES}
    st_sa2 = {s: st[s]["sa2"] for s in SIDES}

    # --- sa1: multi-scale dense grouping, h-stacked conv chains -----------
    scale_outs = []
    for i, sel in enumerate(sels):
        layers = [
            _stacked(p_sa1, st_sa1, f"conv_{i}_{j}", f"bn_{i}_{j}")
            for j in range(len(_MLPS[i]))
        ]
        # first-layer split (cf. SetAbstractionMsg._dense_scale): the input
        # is conv0([f_n, x_n - c_s]); u holds the per-point half, v the
        # per-centroid half, bias restored once
        W0, b0 = layers[0]
        D = feats.shape[-1]
        xyz_h = jnp.broadcast_to(xyz, (2,) + xyz.shape)
        u = jnp.einsum(
            "hbnc,hcd->hbnd", jnp.concatenate([feats, xyz_h], -1), W0,
            precision=hp,
        )
        cent = jnp.concatenate(
            [jnp.zeros((B, S, D), xyz.dtype), new_xyz], -1
        )
        v = jnp.einsum("bsc,hcd->hbsd", cent, W0, precision=hp)

        chunks = []
        for s0 in range(0, S, s_chunk):
            z = jax.nn.relu(
                u[:, :, None, :, :] - v[:, :, s0 : s0 + s_chunk, None, :]
                + b0[:, None, None, None, :]
            )                                            # [2, B, c, N, C1]
            for W, b in layers[1:]:
                z = jax.nn.relu(
                    jnp.einsum("hbsnc,hcd->hbsnd", z, W) + b[:, None, None, None, :]
                )
            m = sel[None, :, s0 : s0 + s_chunk, :, None]
            chunks.append(jnp.max(jnp.where(m, z, -jnp.inf), axis=3))
        scale_outs.append(jnp.concatenate(chunks, axis=2))  # [2, B, S, Ci]
    l1_points = jnp.concatenate(scale_outs, axis=-1)        # [2, B, S, 512]

    # --- sa2: group_all + conv chain + global max -------------------------
    # grouped = concat([xyz, points]) like ops.pointnet.group_all
    g = jnp.concatenate(
        [jnp.broadcast_to(new_xyz, (2,) + new_xyz.shape), l1_points], -1
    )                                                       # [2, B, S, 3+512]
    x = g
    for j in range(len(_SA2_MLP)):
        W, b = _stacked(p_sa2, st_sa2, f"conv_{j}", f"bn_{j}")
        x = jax.nn.relu(jnp.einsum("hbsc,hcd->hbsd", x, W) + b[:, None, None, :])
    x = jnp.max(x, axis=2)                                  # [2, B, 512]

    # --- regressor MLP: fc0 -> ReLU -> BN(folded) -> fc1 -------------------
    # fc0 has no BN directly after (order: fc0, relu, bn, dropout, fc1), so
    # fold the BN into a standalone affine applied after the ReLU.
    W0s = jnp.stack([p[s]["fc_0"]["kernel"] for s in SIDES])
    b0s = jnp.stack([p[s]["fc_0"]["bias"] for s in SIDES])
    x = jax.nn.relu(jnp.einsum("hbc,hcd->hbd", x, W0s) + b0s[:, None, :])
    bn_s = jnp.stack([
        p[s]["bn"]["scale"] * jax.lax.rsqrt(st[s]["bn"]["var"] + 1e-5)
        for s in SIDES
    ])
    bn_b = jnp.stack([
        p[s]["bn"]["bias"]
        - p[s]["bn"]["scale"] * st[s]["bn"]["mean"]
        * jax.lax.rsqrt(st[s]["bn"]["var"] + 1e-5)
        for s in SIDES
    ])
    x = x * bn_s[:, None, :] + bn_b[:, None, :]
    W1s = jnp.stack([p[s]["fc_1"]["kernel"] for s in SIDES])
    b1s = jnp.stack([p[s]["fc_1"]["bias"] for s in SIDES])
    out = jnp.einsum("hbc,hcd->hbd", x, W1s) + b1s[:, None, :]  # [2, B, 22]

    np_, ns = n_pose_params, n_shape_params

    def split(o):
        return {
            "global_orient": o[:, :3],
            "hand_pose": o[:, 3 : 3 + np_],
            "betas": o[:, 3 + np_ : 3 + np_ + ns],
            "transl": o[:, -3:],
        }

    return split(out[0]), split(out[1])
