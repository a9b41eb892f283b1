"""PointNet++ building blocks as flax modules (channels-last, TPU layout).

Re-designs of the reference's torch modules:
  * ``PointNetSetAbstractionMsg``  (``pointnet2_utils.py:205-262``)
  * ``PointNetSetAbstraction`` with ``group_all``  (``:161-202``)
  * ``PointNetFeaturePropagation``  (``:265-315``)
  * ``AttentionBlock``  (``TEHNet.py:9-27``)

The torch 1x1 Conv2d/Conv1d + BatchNorm stacks become Dense + BatchNorm over
the trailing channel axis — identical math, natural XLA layout (the matmul
hits the MXU directly, no permutes). Param names (``conv_{i}_{j}``,
``bn_{i}_{j}``, ...) deliberately mirror the torch ``state_dict`` indices so
checkpoint ingestion (checkpoint.py) is a mechanical rename.

BatchNorm uses torch semantics: eps=1e-5, running-average momentum 0.1
(flax ``momentum=0.9``). One documented deviation: torch stores the
*unbiased* batch variance into the running average while normalizing with the
biased one; flax uses the biased variance for both. This only perturbs
running stats during (fine)tuning, never checkpoint-parity inference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ev2hands_tpu.ops.pallas_ops import fps_auto
from ev2hands_tpu.ops.pointnet import (
    group_all,
    index_points,
    query_ball_point,
    sample_and_group,
    three_nn_interpolate,
)


def _bn(train: bool, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class SetAbstractionMsg(nn.Module):
    """Multi-scale-grouping set abstraction.

    Input xyz [B, N, 3], points [B, N, D] -> (new_xyz [B, S, 3],
    new_points [B, S, sum(mlp[-1])]). One FPS shared across scales, per-scale
    ball query + Dense/BN/ReLU stack + max-pool over the neighborhood.
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        points: Optional[jax.Array],
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        fps_idx = fps_auto(xyz, self.npoint, key=fps_key)
        new_xyz = index_points(xyz, fps_idx)  # [B, S, 3]

        outs = []
        for i, radius in enumerate(self.radius_list):
            k = self.nsample_list[i]
            idx = query_ball_point(radius, k, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [index_points(points, idx), grouped_xyz], axis=-1
                )
            else:
                grouped = grouped_xyz
            x = grouped  # [B, S, K, C]
            for j, width in enumerate(self.mlps[i]):
                x = nn.Dense(width, name=f"conv_{i}_{j}")(x)
                x = _bn(train, f"bn_{i}_{j}")(x)
                x = nn.relu(x)
            outs.append(jnp.max(x, axis=2))  # [B, S, width]

        return new_xyz, jnp.concatenate(outs, axis=-1)


class SetAbstractionAll(nn.Module):
    """Global set abstraction (``group_all=True``): one group over all points,
    Dense/BN/ReLU stack, max-pool -> [B, 1, mlp[-1]]."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self, xyz: jax.Array, points: Optional[jax.Array], train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        new_xyz, grouped = group_all(xyz, points)  # [B, 1, N, 3+D]
        x = grouped
        for j, width in enumerate(self.mlp):
            x = nn.Dense(width, name=f"conv_{j}")(x)
            x = _bn(train, f"bn_{j}")(x)
            x = nn.relu(x)
        return new_xyz, jnp.max(x, axis=2)  # [B, 1, width]


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance feature propagation + pointwise Dense/BN/ReLU."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        xyz1: jax.Array,            # [B, N, 3] dense positions
        xyz2: jax.Array,            # [B, S, 3] coarse positions
        points1: Optional[jax.Array],  # [B, N, D1] dense features (skip link)
        points2: jax.Array,         # [B, S, D2] coarse features
        train: bool = False,
    ) -> jax.Array:
        S = xyz2.shape[1]
        if S == 1:
            interpolated = jnp.broadcast_to(
                points2, (points2.shape[0], xyz1.shape[1], points2.shape[2])
            )
        else:
            interpolated = three_nn_interpolate(xyz1, xyz2, points2)

        x = (
            jnp.concatenate([points1, interpolated], axis=-1)
            if points1 is not None
            else interpolated
        )
        for j, width in enumerate(self.mlp):
            x = nn.Dense(width, name=f"conv_{j}")(x)
            x = _bn(train, f"bn_{j}")(x)
            x = nn.relu(x)
        return x


def attention_block(key: jax.Array, value: jax.Array, query: jax.Array) -> jax.Array:
    """Class-space attention (``TEHNet.py:13-27``), channels-last.

    key   [B, N, KC]  — per-event class logits (KC = num classes)
    value [B, N, C]   — fused per-event features
    query [B, N, C]   — per-hand query projection of the features

    sim = softmax_over_classes(key^T @ query / sqrt(KC)) : [B, KC, C]
    out[b, n, k] = sum_c sim[b, k, c] * value[b, n, c]   : [B, N, KC]
    """
    kc = key.shape[-1]
    sim = jnp.einsum("bnk,bnc->bkc", key, query) * (kc**-0.5)
    sim = jax.nn.softmax(sim, axis=1)  # over the class axis, like the reference
    return jnp.einsum("bkc,bnc->bnk", sim, value)


class QueryConv(nn.Module):
    """Per-hand query head: two k=3 convs over the (time-sorted) event axis
    with ReLU/BN/Dropout between (``TEHNet.py:150-166``).

    Layout [B, N, C]; torch Sequential slots are conv0,relu,bn0,drop,conv1,bn1.
    """

    features: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, kernel_size=(3,), padding="SAME", name="conv_0")(x)
        x = nn.relu(x)
        x = _bn(train, "bn_0")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.features, kernel_size=(3,), padding="SAME", name="conv_1")(x)
        x = _bn(train, "bn_1")(x)
        return x
