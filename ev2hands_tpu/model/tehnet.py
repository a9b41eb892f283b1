"""TEHNet: the two-event-hand network, as one fixed-shape flax module.

Architecture re-design of the reference (``src/Ev2Hands/model/TEHNet.py``):
a PointNet++ encoder-decoder over the 2048-event ERPC cloud, a 4-class
per-event segmentation head, class-space attention for left/right
disambiguation, and two MANO parameter regressors.

Differences from the reference by design:
  * channels-last [B, N, C] everywhere (TPU/XLA layout);
  * the hidden ``ERPC``/``MHLNES`` env flags are explicit config fields;
  * the MANO layers live *outside* the learned module — ``TEHNet`` regresses
    the 22 parameters per hand and ``apply_mano`` (pure function of constant
    ManoParams) turns them into vertices/joints, so the full forward is one
    jitted XLA program with clean param/constant separation.

Channel bookkeeping (mirrors ``TEHNet.py:127-166`` for checkpoint parity):
  sa1: Msg 2048->512, r=(.1,.2,.4), k=(32,64,128), in 5(+3), mlps
       [[32,32,64],[64,64,128],[64,96,128]] -> 320
  sa2: Msg 512->128, r=(.4,.8), k=(64,128), in 320(+3),
       mlps [[128,128,256],[128,196,256]] -> 512
  sa3: all, in 512+3 -> [256,512,1024]
  fp3: in 512+1024 -> [256,256]; fp2: in 320+256 -> [256,128];
  fp1: in 128 -> [128,128,256]
  classifier: 256 -> 256 -> 4 (k=1 convs with ReLU/BN/Dropout between)
  query convs: two k=3 convs per hand; attention -> [B, N, 4]
  regressor per hand: Msg 128 centroids + global SA -> 512 -> MLP(1024) -> 22
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ev2hands_tpu.config import ModelConfig
from ev2hands_tpu.mano.layer import ManoParams, mano_forward
from ev2hands_tpu.model.layers import (
    FeaturePropagation,
    QueryConv,
    SetAbstractionAll,
    SetAbstractionMsg,
    _bn,
    attention_block,
)


# Centroid count of the regressor heads' sa1 layer. Shared with TEHNet's
# eval-time one-FPS-for-both-heads call (see ``reg_fps_idx`` below) — a
# mismatch would silently feed a wrong-size sampling into both heads.
REGRESSOR_NPOINT = 128


class ManoRegressor(nn.Module):
    """Per-hand MANO parameter regressor (``TEHNet.py:30-112``).

    Consumes the shared event positions plus the 4-channel attention features
    and regresses the 22 = 3 (global_orient) + 6 (PCA pose) + 10 (betas) +
    3 (transl) MANO parameters. The MANO mesh itself is applied outside the
    learned module (see ``apply_mano``).
    """

    n_pose_params: int = 6
    n_shape_params: int = 10
    dropout: float = 0.3
    grouping: str = "dense"
    dense_train: bool = False
    dense_chunk: int = 32
    event_mesh: Optional[object] = None
    pallas_grouping: bool = True
    pallas_nb: int = 256
    pallas_fused: bool = False
    pallas_gather: bool = False  # matches ModelConfig.pallas_gather (measured)
    uv_gather: bool = False      # see ModelConfig.uv_split_gather
    pallas_gather_nb: int = 128
    pallas_gather_bwd: bool = False
    pallas_gather_wide: bool = True
    bf16: bool = False  # see ModelConfig.bf16_train
    bf16_eval: bool = False  # see ModelConfig.bf16_eval
    rank_ball_query: bool = False  # see ModelConfig.rank_ball_query

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,        # [B, N, 3]
        features: jax.Array,   # [B, N, 4]
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
        fps_idx: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        l1_xyz, l1_points = SetAbstractionMsg(
            npoint=REGRESSOR_NPOINT,
            radius_list=(0.4, 0.8),
            nsample_list=(64, 128),
            mlps=((128, 128, 256), (128, 196, 256)),
            grouping=self.grouping,
            dense_train=self.dense_train,
            dense_chunk=self.dense_chunk,
            event_mesh=self.event_mesh,
            pallas_grouping=self.pallas_grouping,
            pallas_nb=self.pallas_nb,
            pallas_fused=self.pallas_fused,
            pallas_gather=self.pallas_gather,
            uv_gather=self.uv_gather,
            pallas_gather_nb=self.pallas_gather_nb,
            pallas_gather_bwd=self.pallas_gather_bwd,
            pallas_gather_wide=self.pallas_gather_wide,
            rank_ball_query=self.rank_ball_query,
            bf16=self.bf16,
            bf16_eval=self.bf16_eval,
            name="sa1",
        )(xyz, features, train, fps_key, fps_idx)
        _, l2_points = SetAbstractionAll(
            mlp=(256, 512), bf16=self.bf16, bf16_eval=self.bf16_eval,
            name="sa2"
        )(l1_xyz, l1_points, train)
        x = l2_points[:, 0, :]  # [B, 512]

        # torch Sequential slots: fc0, ReLU, BN, Dropout(0.3), fc1
        x = nn.Dense(1024, name="fc_0")(x)
        x = nn.relu(x)
        x = _bn(train, "bn")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        out = nn.Dense(3 + self.n_pose_params + self.n_shape_params + 3, name="fc_1")(x)

        np_, ns = self.n_pose_params, self.n_shape_params
        return {
            "global_orient": out[:, :3],
            "hand_pose": out[:, 3 : 3 + np_],
            "betas": out[:, 3 + np_ : 3 + np_ + ns],
            "transl": out[:, -3:],
        }


class TEHNet(nn.Module):
    """Full network: events [B, N, C_in] -> segmentation logits + per-hand
    MANO parameters (``TEHNet.py:115-197``)."""

    cfg: ModelConfig = ModelConfig()
    # jax.sharding.Mesh with an 'event' axis (and optionally 'data'):
    # enables event-dimension sharding of the dense-mode quadratic pair work
    # when cfg.event_parallel is set (SURVEY §5's context-parallel analogue).
    event_mesh: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        events: jax.Array,  # [B, N, C_in] normalized ERPC cloud
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        cfg = self.cfg
        emesh = self.event_mesh if cfg.event_parallel else None
        g_sa1 = cfg.grouping_sa1 or cfg.grouping
        g_sa2 = cfg.grouping_sa2 or cfg.grouping
        g_reg = cfg.grouping_regressor or cfg.grouping
        l0_points = events
        l0_xyz = events[..., :3]
        if cfg.mhlnes:
            # replace the time coordinate with the mean polarity channels
            l0_xyz = l0_xyz.at[..., 2].set(jnp.mean(events[..., 3:], axis=-1))

        if cfg.fps_deterministic or not train:
            keys = [None] * 4
        else:
            keys = list(jax.random.split(self.make_rng("fps"), 4))

        l1_xyz, l1_points = SetAbstractionMsg(
            npoint=512,
            radius_list=(0.1, 0.2, 0.4),
            nsample_list=(32, 64, 128),
            mlps=((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            grouping=g_sa1,
            dense_train=cfg.dense_train,
            dense_chunk=cfg.dense_chunk,
            event_mesh=emesh,
            pallas_grouping=cfg.pallas_grouping,
            pallas_nb=cfg.pallas_nb,
            pallas_fused=cfg.pallas_fused_msg,
            pallas_gather=cfg.pallas_gather,
            uv_gather=cfg.uv_split_gather,
            pallas_gather_nb=cfg.pallas_gather_nb,
            pallas_gather_bwd=cfg.pallas_gather_bwd,
            pallas_gather_wide=cfg.pallas_gather_wide,
            rank_ball_query=cfg.rank_ball_query,
            bf16=cfg.bf16_train,
            bf16_eval=cfg.bf16_eval,
            name="sa1",
        )(l0_xyz, l0_points, train, keys[0])
        l2_xyz, l2_points = SetAbstractionMsg(
            npoint=128,
            radius_list=(0.4, 0.8),
            nsample_list=(64, 128),
            mlps=((128, 128, 256), (128, 196, 256)),
            grouping=g_sa2,
            dense_train=cfg.dense_train,
            dense_chunk=cfg.dense_chunk,
            event_mesh=emesh,
            pallas_grouping=cfg.pallas_grouping,
            pallas_nb=cfg.pallas_nb,
            pallas_fused=cfg.pallas_fused_msg,
            pallas_gather=cfg.pallas_gather,
            uv_gather=cfg.uv_split_gather,
            pallas_gather_nb=cfg.pallas_gather_nb,
            pallas_gather_bwd=cfg.pallas_gather_bwd,
            pallas_gather_wide=cfg.pallas_gather_wide,
            rank_ball_query=cfg.rank_ball_query,
            bf16=cfg.bf16_train,
            bf16_eval=cfg.bf16_eval,
            name="sa2",
        )(l1_xyz, l1_points, train, keys[1])
        l3_xyz, l3_points = SetAbstractionAll(
            mlp=(256, 512, 1024), bf16=cfg.bf16_train,
            bf16_eval=cfg.bf16_eval, name="sa3"
        )(l2_xyz, l2_points, train)

        l2_points = FeaturePropagation(mlp=(256, 256), bf16=cfg.bf16_train,
                                       bf16_eval=cfg.bf16_eval, name="fp3")(
            l2_xyz, l3_xyz, l2_points, l3_points, train
        )
        l1_points = FeaturePropagation(mlp=(256, 128), bf16=cfg.bf16_train,
                                       bf16_eval=cfg.bf16_eval, name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train
        )
        l0_feats = FeaturePropagation(mlp=(128, 128, 256), bf16=cfg.bf16_train,
                                      bf16_eval=cfg.bf16_eval, name="fp1")(
            l0_xyz, l1_xyz, None, l1_points, train
        )

        # classifier: conv0, ReLU, BN, Dropout(0.3), conv1 (k=1 convs = Dense)
        bf16_ev = (cfg.bf16_eval and not train and not self.is_initializing())
        cdt = (jnp.bfloat16
               if ((cfg.bf16_train and train) or bf16_ev) else None)
        x = nn.Dense(256, dtype=cdt, name="classifier_conv_0")(l0_feats)
        x = nn.relu(x)
        x = _bn(train, "classifier_bn",
                dtype=jnp.bfloat16 if bf16_ev else None)(x)
        x = nn.Dropout(cfg.dropout_classifier, deterministic=not train)(x)
        seg_logits = nn.Dense(cfg.num_classes, name="classifier_conv_1")(x)

        feat_fuse = l0_feats
        left_query = QueryConv(dropout=cfg.dropout_query, bf16=cfg.bf16_train,
                               bf16_eval=cfg.bf16_eval,
                               name="left_query_conv")(
            feat_fuse, train
        )
        right_query = QueryConv(dropout=cfg.dropout_query, bf16=cfg.bf16_train,
                                bf16_eval=cfg.bf16_eval,
                                name="right_query_conv")(
            feat_fuse, train
        )
        left_features = attention_block(seg_logits, feat_fuse, left_query)
        right_features = attention_block(seg_logits, feat_fuse, right_query)

        # Inference fast path: both regressor heads as ONE h-stacked pass
        # with shared FPS/selection masks and folded BN (exact eval numerics,
        # fewer+larger MXU matmuls). Training and init use the flax modules,
        # which own the parameter tree.
        use_fused = (
            cfg.fused_regressors and not train and g_reg == "dense"
            and emesh is None and not self.is_initializing()
        )
        if use_fused:
            from ev2hands_tpu.model.fused_regressor import (
                fused_two_hand_regressor,
            )

            left, right = fused_two_hand_regressor(
                self.variables, l0_xyz, left_features, right_features
            )
        else:
            # With deterministic FPS (eval, or fps_deterministic training)
            # both heads sample the SAME xyz with the same start — compute
            # the sampling once; the reference's random-FPS training keeps
            # independent per-head draws (TEHNet.py:194-195 semantics).
            reg_fps_idx = None
            # cfg.shared_head_fps extends the eval-path sharing to random-FPS
            # training: ONE draw (keys[2]) feeds both heads, so their sa1
            # sampling/ball-query/sqrdist machinery CSEs into one computation.
            if (keys[2] is None and keys[3] is None) or cfg.shared_head_fps:
                if emesh is not None and not self.is_initializing():
                    from ev2hands_tpu.parallel.event_parallel import (
                        event_sharded_fps,
                    )

                    reg_fps_idx = event_sharded_fps(
                        emesh, l0_xyz, REGRESSOR_NPOINT, key=keys[2]
                    )
                else:
                    from ev2hands_tpu.ops.pallas_ops import fps_auto

                    reg_fps_idx = fps_auto(
                        l0_xyz, REGRESSOR_NPOINT, key=keys[2])
            left = ManoRegressor(
                dropout=cfg.dropout_regressor, grouping=g_reg,
                dense_train=cfg.dense_train,
                dense_chunk=cfg.regressor_dense_chunk,
                event_mesh=emesh, pallas_grouping=cfg.pallas_grouping,
                pallas_nb=cfg.pallas_nb,
                pallas_fused=cfg.pallas_fused_msg,
                pallas_gather=cfg.pallas_gather,
                uv_gather=cfg.uv_split_gather,
                pallas_gather_nb=cfg.pallas_gather_nb,
                pallas_gather_bwd=cfg.pallas_gather_bwd,
                pallas_gather_wide=cfg.pallas_gather_wide,
                rank_ball_query=cfg.rank_ball_query,
                bf16=cfg.bf16_train,
                bf16_eval=cfg.bf16_eval,
                name="left_mano_regressor",
            )(l0_xyz, left_features, train, keys[2], reg_fps_idx)
            right = ManoRegressor(
                dropout=cfg.dropout_regressor, grouping=g_reg,
                dense_train=cfg.dense_train,
                dense_chunk=cfg.regressor_dense_chunk,
                event_mesh=emesh, pallas_grouping=cfg.pallas_grouping,
                pallas_nb=cfg.pallas_nb,
                pallas_fused=cfg.pallas_fused_msg,
                pallas_gather=cfg.pallas_gather,
                uv_gather=cfg.uv_split_gather,
                pallas_gather_nb=cfg.pallas_gather_nb,
                pallas_gather_bwd=cfg.pallas_gather_bwd,
                pallas_gather_wide=cfg.pallas_gather_wide,
                rank_ball_query=cfg.rank_ball_query,
                bf16=cfg.bf16_train,
                bf16_eval=cfg.bf16_eval,
                name="right_mano_regressor",
            )(l0_xyz, right_features, train, keys[3], reg_fps_idx)

        return {"class_logits": seg_logits, "left": left, "right": right}


def apply_mano(
    hands: Dict[str, ManoParams], outputs: Dict[str, Dict[str, jax.Array]]
) -> Dict[str, Dict[str, jax.Array]]:
    """Attach MANO vertices / 21 joints to the regressed parameters
    (the reference does this inside ``MANORegressor.forward`` at
    ``TEHNet.py:103-105``; here it is a pure function of constant params)."""
    out = dict(outputs)
    for side in ("left", "right"):
        res = mano_forward(
            hands[side],
            outputs[side]["global_orient"],
            outputs[side]["hand_pose"],
            outputs[side]["betas"],
            outputs[side]["transl"],
        )
        out[side] = dict(outputs[side], vertices=res.vertices, j3d=res.joints)
    return out


def tehnet_forward(
    model: TEHNet,
    variables: Dict,
    hands: Dict[str, ManoParams],
    events: jax.Array,
    train: bool = False,
    rngs: Optional[Dict[str, jax.Array]] = None,
):
    """Convenience full forward: network + MANO. Returns (outputs, updates)
    where updates holds new batch_stats when training."""
    if train:
        outputs, updates = model.apply(
            variables, events, train=True, rngs=rngs, mutable=["batch_stats"]
        )
    else:
        outputs = model.apply(variables, events, train=False, rngs=rngs)
        updates = None
    return apply_mano(hands, outputs), updates
