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
    query_ball_point_permuted,
    square_distance,
    three_nn_interpolate,
)


def _bn(train: bool, name: str, dtype=None) -> nn.BatchNorm:
    # ``dtype`` is only ever non-None on EVAL traces under bf16_eval: the
    # running-stat normalization computes in bfloat16 so the activation
    # chain stays bf16 between MXU dots. Training BN always keeps f32 stat
    # math (bf16_train leaves BN dtype at None; flax promotion with f32
    # params keeps the normalization f32).
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=name
    )


class PairBatchNorm(nn.Module):
    """BatchNorm param/stat holder for the dense-formulation TRAINING path.

    Parameter/variable tree is identical to ``nn.BatchNorm(name=...)``
    (params ``scale``/``bias``, batch_stats ``mean``/``var``) so checkpoints
    and the eval paths are unchanged. Instead of normalizing a tensor it
    *finalizes* weighted sums accumulated across centroid chunks into batch
    statistics — the multiplicity weights make the statistics equal (to
    float accumulation order) to the gather path's BatchNorm over the
    selected-neighbor multiset, backfill duplicates included
    (reference BN over grouped neighbors: ``pointnet2_utils.py:253-257``).
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )

    def update_stats(self, mean: jax.Array, var: jax.Array) -> None:
        """Fold finalized batch stats into the running averages (flax
        momentum convention; no gradient flows through the update)."""
        if not self.is_initializing():
            m = self.momentum
            self.ra_mean.value = m * self.ra_mean.value + (1 - m) * mean
            self.ra_var.value = m * self.ra_var.value + (1 - m) * var

    def finalize(self, wsum: jax.Array, wsqsum: jax.Array, count: float):
        """(Σ w·z, Σ w·z², Σ w) -> per-channel affine (a, b) with
        y = a*z + b the batch-normalized activation; updates running stats
        like flax BatchNorm (biased variance for both, documented deviation
        from torch's unbiased running var)."""
        mean = wsum / count
        var = jnp.maximum(wsqsum / count - mean**2, 0.0)
        self.update_stats(mean, var)
        inv = self.scale / jnp.sqrt(var + self.epsilon)
        return inv, self.bias - mean * inv


class SetAbstractionMsg(nn.Module):
    """Multi-scale-grouping set abstraction.

    Input xyz [B, N, 3], points [B, N, D] -> (new_xyz [B, S, 3],
    new_points [B, S, sum(mlp[-1])]). One FPS shared across scales, per-scale
    ball query + Dense/BN/ReLU stack + max-pool over the neighborhood.

    Two execution modes with identical eval-time numerics:
      * ``gather``: the reference's formulation — top_k ball query, gather
        the K neighbors, conv over [B, S, K, C]. Used in training (BatchNorm
        batch statistics are computed over the same selected-neighbor
        multiset as the reference, incl. backfill duplicates).
      * ``dense``: gather/sort-free — the "first K in-radius" neighbor set is
        a dense [B, S, N] mask (in-radius AND exclusive-cumsum rank < K); the
        conv chain runs over all (centroid, point) pairs in S-chunks with the
        first layer decomposed into per-point + per-centroid halves, and the
        masked max-pool reproduces the reference's pooled value exactly
        (duplicated backfill neighbors never change a max). 2-10x faster on
        TPU, where gathers and sorts dominate the gather mode.
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlps: Sequence[Sequence[int]]
    grouping: str = "dense"   # 'dense' | 'gather'
    dense_chunk: int = 64     # centroids per chunk in dense mode
    # Run the gather-free dense formulation in TRAINING too, with
    # multiplicity-weighted BatchNorm batch statistics that exactly reproduce
    # the gather path's stats over the selected-neighbor multiset (backfill
    # duplicates included). See _dense_train_scale; status/measurements in
    # ModelConfig.dense_train.
    dense_train: bool = False
    # Optional jax.sharding.Mesh with an 'event' axis: shards the quadratic
    # [S, N] pair work of the dense eval path over devices (the
    # context-parallel analogue, SURVEY §5). Inference-only — training keeps
    # the gather path for BN-stat parity. See parallel/event_parallel.py.
    event_mesh: Optional[object] = None
    # Use the fused Pallas grouping kernel for scales where it measured
    # faster than the XLA dense path (see _use_pallas_scale); TPU eval only.
    pallas_grouping: bool = True
    # Point-tile size for the block-sparse kernel (see ModelConfig.pallas_nb).
    pallas_nb: int = 256
    # One fused kernel pass over all scales (see ModelConfig.pallas_fused_msg).
    pallas_fused: bool = False
    # Gather-mode (train-path) neighbor materialization through the
    # block-sparse one-hot MXU gather — measured slower end-to-end than
    # XLA's index_points; default matches ModelConfig.pallas_gather.
    pallas_gather: bool = False
    # Gather-mode first-conv u/v split (see ModelConfig.uv_split_gather):
    # apply each scale's conv0 per POINT before the gather and reconstruct
    # the pair activation as u_n - v_s + b. The TPU gather cost law is
    # per-row and invariant to row bytes (scripts/gather_scaling.py), so
    # gathering the wider conv0 outputs costs the same as the raw rows
    # while the per-pair conv0 dots and the grouped concat/subtract
    # disappear from forward AND backward.
    uv_gather: bool = False
    pallas_gather_nb: int = 128
    # backward of the one-hot gather: XLA scatter-add (False) or the
    # transposed one-hot kernel (True) — see ModelConfig.pallas_gather_bwd
    pallas_gather_bwd: bool = False
    # extend the one-hot gather to wide-channel sources (sa2's 323-feature
    # rows, padded to 128-lane hi|mid|lo segments) — see
    # ModelConfig.pallas_gather_wide
    pallas_gather_wide: bool = True
    # bfloat16 compute for the training-path conv chain (params/BN stats
    # stay f32; eval traces untouched) — see ModelConfig.bf16_train
    bf16: bool = False
    # bfloat16 compute+normalization for the EVAL conv chains (selection
    # math stays f32, indices identical) — see ModelConfig.bf16_eval
    bf16_eval: bool = False
    # sort-free cumsum-rank ball-query selection on the gather path,
    # bitwise-identical indices — see ModelConfig.rank_ball_query
    rank_ball_query: bool = False

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        points: Optional[jax.Array],
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
        fps_idx: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        # ``fps_idx`` lets callers share one sampling across structurally
        # identical layers (the two regressor heads sample the SAME xyz with
        # the same deterministic start in eval; as separate Pallas
        # custom-calls XLA cannot CSE them, nor the distance/selection
        # subgraphs downstream of their outputs).
        if fps_idx is None:
            if self.event_mesh is not None and not self.is_initializing():
                # shard the O(npoint * N) greedy scan over the event axis —
                # otherwise FPS is the replicated Amdahl term at large N
                from ev2hands_tpu.parallel.event_parallel import (
                    event_sharded_fps,
                )

                fps_idx = event_sharded_fps(
                    self.event_mesh, xyz, self.npoint, key=fps_key
                )
            else:
                fps_idx = fps_auto(xyz, self.npoint, key=fps_key)
        new_xyz = index_points(xyz, fps_idx)  # [B, S, 3]

        use_dense = self.grouping == "dense" and not train and points is not None
        use_dense_train = (
            self.grouping == "dense" and train and self.dense_train
            and points is not None
        )
        # event sharding needs live params (folded BN), so never during init
        use_event = (
            use_dense and self.event_mesh is not None
            and not self.is_initializing()
        )
        use_event_train = (
            use_dense_train and self.event_mesh is not None
            and not self.is_initializing()
        )
        gather_mode = (
            not use_dense and not use_dense_train and not use_event
        )
        use_pgather = gather_mode and self._use_pallas_gather(
            xyz.shape[1], 0 if points is None else points.shape[-1]
        )
        sqrdists = None
        perm = xyz_p = points_p = None
        if (not use_event and not use_event_train) and not use_pgather:
            # one [B, S, N] distance tensor shared by every scale (both the
            # dense mask path and the gather-mode ball query consume it)
            sqrdists = square_distance(new_xyz, xyz)
            if use_dense and any(
                self._use_pallas_scale(i, xyz.shape[1])
                for i in range(len(self.radius_list))
            ):
                # Morton-order the points ONCE, shared by every sparse-kernel
                # scale: spatial locality is what lets the kernel skip point
                # tiles with no selected neighbor (see pallas_grouping.py).
                from ev2hands_tpu.ops.pallas_grouping import morton_perm

                perm = morton_perm(xyz)
                xyz_p = jnp.take_along_axis(xyz, perm[..., None], axis=1)
                points_p = jnp.take_along_axis(points, perm[..., None], axis=1)

        # bf16 compute on the training gather branch (bf16_train) and on the
        # eval conv chains (bf16_eval). The Pallas scales fold BN into f32
        # weights and run bf16 MXU dots regardless; _dense_train_scale's
        # manual weighted-stat sweeps stay f32 (dtype applies per-trace;
        # train is a static bool, so each trace sees exactly one mode).
        bf16_ev = self.bf16_eval and not train and not self.is_initializing()
        dt = (
            jnp.bfloat16
            if ((self.bf16 and train and gather_mode) or bf16_ev)
            else None
        )
        # eval BatchNorm joins the bf16 chain only under bf16_eval; training
        # BN always keeps f32 stat math
        bn_dt = jnp.bfloat16 if bf16_ev else None
        use_uv = (
            gather_mode and not use_pgather and self.uv_gather
            and points is not None
        )
        gathered = None
        uv_convs = None
        if use_uv:
            # u/v split of every scale's FIRST conv, applied per point
            # BEFORE the gather: conv0([f_n, x_n - c_s]) is linear, so
            # z[s, n] = u_n - v_s + b with u_n = conv0([f_n, x_n]),
            # v_s = conv0([0, c_s]) (the zero-input call restores the bias
            # v subtracts). The TPU gather cost law is per-row, invariant
            # to row bytes (scripts/gather_scaling.py: 7.4 ms at 8 AND 128
            # channels for the production row count), so gathering the
            # wider conv0 outputs costs the same as the raw rows while the
            # per-pair conv0 dots and the grouped concat/subtract drop out
            # of forward and backward. Values match the reference's
            # grouped-conv formulation up to float rounding (same identity
            # the dense eval path uses; BN sees the same selected-neighbor
            # multiset, so stat semantics are unchanged).
            idxs = [
                query_ball_point(r, self.nsample_list[i], xyz, new_xyz,
                                 sqrdists=sqrdists,
                                 rank=self.rank_ball_query)
                for i, r in enumerate(self.radius_list)
            ]
            cat_idx = jnp.concatenate(idxs, axis=-1)   # [B, S, sum(K)]
            uv_convs = [
                [nn.Dense(w, dtype=dt, name=f"conv_{i}_{j}")
                 for j, w in enumerate(self.mlps[i])]
                for i in range(len(self.radius_list))
            ]
            src_cat = jnp.concatenate([points, xyz], axis=-1)
            u_cat = jnp.concatenate(
                [uv_convs[i][0](src_cat)
                 for i in range(len(self.radius_list))], axis=-1,
            )                                          # [B, N, sum(C1_i)]
            gathered = index_points(u_cat, cat_idx)    # [B, S, sum(K), .]
        elif gather_mode and use_pgather:
            # Gather mode on TPU: ball-query in Morton-permuted column space
            # (selection bitwise-unchanged — the packed top_k score is the
            # ORIGINAL index) and materialize the neighbors with the
            # block-sparse one-hot MXU kernel, bitwise-equal to the
            # index_points path below but skipping the ~18 ns/row lane
            # gather (ops/pallas_gather.py).
            from ev2hands_tpu.ops.pallas_gather import (
                grouped_gather,
                pos_tile_activity,
            )
            from ev2hands_tpu.ops.pallas_grouping import morton_perm

            perm_g = morton_perm(xyz)
            xyz_pg = jnp.take_along_axis(xyz, perm_g[..., None], axis=1)
            sqrdists_p = square_distance(new_xyz, xyz_pg)
            poss = [
                query_ball_point_permuted(
                    r, self.nsample_list[i], perm_g, sqrdists_p
                )
                for i, r in enumerate(self.radius_list)
            ]
            cat_pos = jnp.concatenate(poss, axis=-1)   # [B, S, sum(K)]
            if points is not None:
                points_pg = jnp.take_along_axis(
                    points, perm_g[..., None], axis=1
                )
                src_p = jnp.concatenate([points_pg, xyz_pg], axis=-1)
            else:
                src_p = xyz_pg
            act = pos_tile_activity(
                cat_pos, self.pallas_gather_nb, xyz.shape[1]
            )
            gathered = grouped_gather(
                src_p, cat_pos, act, nb=self.pallas_gather_nb,
                bwd="pallas" if self.pallas_gather_bwd else "xla",
            )                                          # [B, S, sum(K), D+3]
        elif gather_mode:
            # Gather mode: ONE gather for all scales. Six small index_points
            # calls measured 23.0 vs 16.7 ms for one concatenated gather
            # at B=8, S=512, N=2048 on v5e — per-call gather overhead, not
            # bandwidth. Values are identical (same indices, same source).
            idxs = [
                query_ball_point(r, self.nsample_list[i], xyz, new_xyz,
                                 sqrdists=sqrdists,
                                 rank=self.rank_ball_query)
                for i, r in enumerate(self.radius_list)
            ]
            cat_idx = jnp.concatenate(idxs, axis=-1)   # [B, S, sum(K)]
            src = (jnp.concatenate([points, xyz], axis=-1)
                   if points is not None else xyz)
            gathered = index_points(src, cat_idx)      # [B, S, sum(K), D+3]

        if (
            use_dense and self.pallas_fused and perm is not None
            and all(
                self._use_pallas_scale(i, xyz.shape[1])
                for i in range(len(self.radius_list))
            )
        ):
            # one fused kernel pass over every scale (union tile activity,
            # block-diagonal stacked weights) — emits the scales already in
            # concatenation order
            return new_xyz, self._pallas_scales_fused(
                xyz, new_xyz, sqrdists, perm, xyz_p, points_p
            )

        outs = []
        k_off = 0
        c_off = 0
        for i, radius in enumerate(self.radius_list):
            k = self.nsample_list[i]
            convs = (
                uv_convs[i] if use_uv else
                [nn.Dense(w, dtype=dt, name=f"conv_{i}_{j}")
                 for j, w in enumerate(self.mlps[i])]
            )
            if use_dense_train:
                # PairBatchNorm owns the same bn_{i}_{j} param/stat tree as
                # nn.BatchNorm; only one of the two binds a given name per
                # trace (train is a static Python bool)
                pbns = [
                    PairBatchNorm(features=width, name=f"bn_{i}_{j}")
                    for j, width in enumerate(self.mlps[i])
                ]
                if use_event_train:
                    outs.append(self._event_train_scale(
                        i, xyz, points, new_xyz, radius, k, pbns
                    ))
                    continue
                outs.append(self._dense_train_scale(
                    i, xyz, points, new_xyz, sqrdists, radius, k, convs, pbns
                ))
                continue
            bns = [_bn(train, f"bn_{i}_{j}", dtype=bn_dt)
                   for j in range(len(self.mlps[i]))]

            if use_event:
                outs.append(self._event_scale(i, xyz, points, new_xyz, radius, k))
                continue
            if use_dense:
                if self._use_pallas_scale(i, xyz.shape[1]):
                    outs.append(
                        self._pallas_scale(
                            i, xyz, new_xyz, radius, k,
                            sqrdists, perm, xyz_p, points_p,
                        )
                    )
                    continue
                outs.append(
                    self._dense_scale(
                        xyz, points, new_xyz, sqrdists, radius, k, convs, bns
                    )
                )
                continue

            if use_uv:
                # z[s, n] = u_n - v_s + b (see the u/v split above); the
                # gathered rows already carry every scale's conv0 output
                c1 = self.mlps[i][0]
                u_g = gathered[:, :, k_off : k_off + k, c_off : c_off + c1]
                k_off += k
                c_off += c1
                D = points.shape[-1]
                v = convs[0](jnp.concatenate(
                    [jnp.zeros((xyz.shape[0], new_xyz.shape[1], D),
                               xyz.dtype), new_xyz], axis=-1))   # [B, S, C1]
                zb = convs[0](jnp.zeros((1, 1, D + 3), xyz.dtype))  # bias
                z = u_g - v[:, :, None, :] + zb[:, None]
                x = nn.relu(bns[0](z))
                for conv, bn in zip(convs[1:], bns[1:]):
                    x = nn.relu(bn(conv(x)))
                outs.append(jnp.max(x, axis=2))  # [B, S, width]
                continue

            g = gathered[:, :, k_off : k_off + k, :]
            k_off += k
            if points is not None:
                D = points.shape[-1]
                grouped = jnp.concatenate(
                    [g[..., :D], g[..., D:] - new_xyz[:, :, None, :]], axis=-1
                )
            else:
                grouped = g - new_xyz[:, :, None, :]
            x = grouped  # [B, S, K, C]
            for conv, bn in zip(convs, bns):
                x = nn.relu(bn(conv(x)))
            outs.append(jnp.max(x, axis=2))  # [B, S, width]

        return new_xyz, jnp.concatenate(outs, axis=-1)

    def _use_pallas_gather(self, n_points: int, d: int) -> bool:
        """Gate for the one-hot MXU gather (ops/pallas_gather.py) on the
        gather-mode (train) path: TPU, tile-divisible N within the Morton
        key range, and VMEM-resident blocks. Narrow sources (3*(D+3) <= 128:
        TEHNet sa1 and the regressor sa1s) ride one contiguous hi|mid|lo
        stack; wide sources (sa2's 320-feature rows) pad each term to a
        128-lane segment and are additionally gated by
        ``pallas_gather_wide``."""
        if not self.pallas_gather or self.is_initializing():
            return False
        import jax as _jax

        if _jax.default_backend() != "tpu":
            return False
        from ev2hands_tpu.ops.pallas_gather import _seg_width

        C = d + 3
        if 3 * C > 128 and not self.pallas_gather_wide:
            return False
        seg = _seg_width(C)
        nb = self.pallas_gather_nb
        return (
            n_points % nb == 0
            and n_points >= 2 * nb    # no skip to exploit below two tiles
            and n_points <= 8192      # full-resolution morton keys
            and self.npoint % 8 == 0  # sb divisibility
            # both pallas_call blocks must sit in VMEM: the full-N source
            # stack and the per-chunk [sb, sum(K), seg] f32 output
            and n_points * 3 * seg * 2 <= 8 * 2**20
            and 8 * sum(self.nsample_list) * seg * 4 <= 4 * 2**20
        )

    def _use_pallas_scale(self, i: int, n_points: int) -> bool:
        """Gate for the block-sparse Pallas grouping kernel
        (``dense_msg_scale_pallas_sparse``): big 3-layer dense-eval scales on
        TPU (the sa1 scales, S*N >= 512*2048). Honest device timings at B=32
        (key-perturbed inputs — XLA hoists loop-invariant work out of naive
        timing scans): sparse(nb=256) 19.8 ms vs p2d 24.4 ms vs XLA dense
        28.5 ms per sa1 scale, prep included. Smaller scales (sa2, the
        regressors) measured better on the in-model XLA dense path, which
        shares one sqrdists tensor across scales.

        Large-N A/B after the morton_perm cap removal (full pipeline, B=16,
        honest timing, scripts/ab_n4096.py): N=2048 392.1 vs 308.5 w/s
        (1.27x); N=4096 218.9 vs 162.5 w/s (1.35x) — the sparse skip wins
        MORE at larger N, since activity density falls with N."""
        if not self.pallas_grouping or self.is_initializing():
            return False
        import jax as _jax

        if _jax.default_backend() != "tpu":
            return False
        mlp = self.mlps[i]
        return (
            len(mlp) == 3
            and n_points % self.pallas_nb == 0  # point-tile divisibility
            and n_points <= 8192          # full-resolution morton keys +
                                          # validated VMEM sizing (the kernel
                                          # is exactness-tested through 4096)
            and self.npoint % 8 == 0      # sb divisibility
            and n_points * self.npoint >= 512 * 2048
        )

    def _pallas_scale(self, i, xyz, new_xyz, radius, k, sqrdists,
                      perm, xyz_p, points_p):
        """One scale through the block-sparse Pallas kernel: BN folds into
        the layer weights, points ride in shared Morton order (``perm``), the
        exact first-K-by-original-index selection mask is computed in XLA
        from the shared ``sqrdists`` and column-permuted, and the kernel
        skips point tiles with no selected neighbor. Bitwise-matches the XLA
        dense path on-device (see ops/pallas_grouping.py)."""
        from ev2hands_tpu.ops.pallas_grouping import (
            dense_msg_scale_pallas_sparse,
            dense_selection_mask,
            fold_scale_params,
            permute_columns,
            tile_activity,
        )

        p = self.variables["params"]
        bs = self.variables["batch_stats"]
        conv_params = [p[f"conv_{i}_{j}"] for j in range(3)]
        bn_params = [
            {**p[f"bn_{i}_{j}"], **bs[f"bn_{i}_{j}"]} for j in range(3)
        ]
        folded = fold_scale_params(
            points_p, xyz_p, new_xyz, conv_params, bn_params
        )
        sel = dense_selection_mask(xyz, new_xyz, radius, k, sqrdists=sqrdists)
        sel_p = permute_columns(sel, perm)
        act = tile_activity(sel_p, self.pallas_nb)
        return dense_msg_scale_pallas_sparse(
            folded, sel_p, act, sb=8, nb=self.pallas_nb)

    def _pallas_scales_fused(self, xyz, new_xyz, sqrdists, perm,
                             xyz_p, points_p):
        """All scales in one block-sparse kernel pass: per-scale BN folds
        into stacked (block-diagonal) weights, per-scale selection masks are
        computed in XLA and column-permuted as usual, and the kernel visits
        the UNION of the per-scale tile activities — 2 dot issues per
        union-active (centroid, tile) instead of 2 per scale-active one
        (the chain is issue-bound; see ops/pallas_grouping.py v6)."""
        from ev2hands_tpu.ops.pallas_grouping import (
            dense_msg_fused_scales_pallas_sparse,
            dense_selection_mask,
            fold_scale_params,
            permute_columns,
            stack_folded_scales,
            tile_activity,
        )

        p = self.variables["params"]
        bs = self.variables["batch_stats"]
        folded_list, sels = [], []
        for i, radius in enumerate(self.radius_list):
            conv_params = [p[f"conv_{i}_{j}"] for j in range(3)]
            bn_params = [
                {**p[f"bn_{i}_{j}"], **bs[f"bn_{i}_{j}"]} for j in range(3)
            ]
            folded_list.append(fold_scale_params(
                points_p, xyz_p, new_xyz, conv_params, bn_params
            ))
            sel = dense_selection_mask(
                xyz, new_xyz, radius, self.nsample_list[i], sqrdists=sqrdists
            )
            sels.append(permute_columns(sel, perm))
        stacked, sections = stack_folded_scales(folded_list)
        sel_all = jnp.stack(sels, axis=1)                    # [B, R, S, N]
        act_union = jnp.stack(
            [tile_activity(s, self.pallas_nb) for s in sels], axis=1
        ).max(axis=1)
        return dense_msg_fused_scales_pallas_sparse(
            stacked, sel_all, act_union, sections, sb=8, nb=self.pallas_nb
        )

    def _event_scale(self, i, xyz, points, new_xyz, radius, k):
        """Dense scale with the event axis sharded over ``self.event_mesh``:
        eval BatchNorm folds into the Dense weights (pure function), and the
        shard_map'd body in parallel/event_parallel.py runs the pair math on
        N/E-sized shards with one tiny all_gather + pmax."""
        from ev2hands_tpu.parallel.event_parallel import (
            event_sharded_msg_scale,
            fold_bn_dense,
        )

        p = self.variables["params"]
        bs = self.variables["batch_stats"]
        layers = []
        for j in range(len(self.mlps[i])):
            conv = p[f"conv_{i}_{j}"]
            bn = p[f"bn_{i}_{j}"]
            st = bs[f"bn_{i}_{j}"]
            layers.append(fold_bn_dense(
                conv["kernel"], conv["bias"],
                bn["scale"], bn["bias"], st["mean"], st["var"],
            ))
        return event_sharded_msg_scale(
            self.event_mesh, xyz, points, new_xyz, layers, radius, k,
            s_chunk=self.dense_chunk,
        )

    def _event_train_scale(self, i, xyz, points, new_xyz, radius, k, pbns):
        """Training MSG scale with the event axis sharded over
        ``self.event_mesh`` — the differentiable, weighted-BN analogue of
        ``_event_scale`` (parallel/event_parallel.py does the shard_map;
        this reads raw conv/BN params and folds the returned global batch
        stats into the running averages)."""
        from ev2hands_tpu.parallel.event_parallel import (
            event_sharded_train_msg_scale,
        )

        p = self.variables["params"]
        L = len(self.mlps[i])
        conv_params = [
            (p[f"conv_{i}_{j}"]["kernel"], p[f"conv_{i}_{j}"]["bias"])
            for j in range(L)
        ]
        bn_params = [
            (p[f"bn_{i}_{j}"]["scale"], p[f"bn_{i}_{j}"]["bias"])
            for j in range(L)
        ]
        pooled, stats = event_sharded_train_msg_scale(
            self.event_mesh, xyz, points, new_xyz, conv_params, bn_params,
            radius, k, s_chunk=self.dense_chunk,
        )
        for pbn, (mean, var) in zip(pbns, stats):
            pbn.update_stats(mean, var)
        return pooled

    def _dense_train_scale(
        self, i, xyz, points, new_xyz, sqrdists, radius, k, convs, pbns
    ):
        """Gather-free TRAINING scale with gather-parity BatchNorm stats.

        The gather path exists in training only so BatchNorm batch statistics
        are computed over the reference's selected-neighbor multiset
        (``pointnet2_utils.py:253-257``). This computes the SAME statistics in
        the dense formulation: each selected (centroid, point) pair carries a
        multiplicity weight — 1, plus ``k - cnt`` extra on the first in-radius
        point when the neighborhood underfills (the gather backfill) — and
        every BN layer's batch mean/var is the weighted mean/var of its
        pre-BN activations over all pairs (Σw = B*S*k exactly).

        Because stats of layer l gate the normalization feeding layer l+1,
        the chain runs as L chunked sweeps: sweep l recomputes layers 0..l-1
        with their finalized affines and accumulates layer l's weighted sums.
        The final sweep also tracks the masked max AND min of the pre-BN last
        layer: BN's per-channel affine is monotone (direction = sign of the
        folded scale), so the pooled activation is
        ``relu(affine(max_z))`` where scale >= 0 and ``relu(affine(min_z))``
        otherwise — no fourth sweep. Chunk bodies are ``jax.checkpoint``-ed:
        backward memory stays at one [B, chunk, N, C] tile per layer.

        Eval-time numerics are untouched (this path only runs when
        ``train=True``); gradient flow matches the gather path — each
        duplicate slot's contribution to stats and pooling is reproduced by
        the weights, and max-tie handling only differs on exact float ties.
        """
        from functools import partial

        B, N, _ = xyz.shape
        S = new_xyz.shape[1]
        D = points.shape[-1]
        L = len(convs)

        mask = sqrdists <= radius**2
        rank = jnp.cumsum(mask, axis=-1) - mask
        sel = mask & (rank < k)
        first = mask & (rank == 0)
        cnt = jnp.sum(mask, axis=-1)
        empty = cnt == 0
        at0 = jnp.arange(N) == 0
        # empty centroids fall back to point 0 with full multiplicity k (the
        # documented dense-mode deviation; unreachable with FPS centroids)
        sel = sel | (empty[..., None] & at0)
        w = sel.astype(xyz.dtype) + first.astype(xyz.dtype) * jnp.maximum(
            k - cnt, 0
        )[..., None].astype(xyz.dtype)
        w = jnp.where(empty[..., None] & at0, float(k), w)
        count = float(B * S * k)

        u = convs[0](jnp.concatenate([points, xyz], axis=-1))       # [B,N,C1]
        v = convs[0](jnp.concatenate(
            [jnp.zeros((B, S, D), xyz.dtype), new_xyz], axis=-1))   # [B,S,C1]
        zb = convs[0](jnp.zeros((1, 1, D + 3), xyz.dtype))          # bias

        init = self.is_initializing()
        if init:
            # params for conv 1..L-1 do not exist yet: create them through
            # the module calls (plain path, no remat — init runs once)
            def apply_conv(j, h):
                return convs[j](h)
        else:
            p = self.variables["params"]
            lp = [(p[f"conv_{i}_{j}"]["kernel"], p[f"conv_{i}_{j}"]["bias"])
                  for j in range(1, L)]

            def apply_conv(j, h):
                kern, bias = lp[j - 1]
                return h @ kern + bias

        chunk = max(1, min(self.dense_chunk, S))

        def stats_chunk(l, s0, affines):
            """Weighted sums of layer l's pre-BN activation for centroid
            chunk [s0, s0+chunk); recomputes layers < l from u/v."""
            z = u[:, None, :, :] - v[:, s0:s0 + chunk, None, :] + zb[:, None]
            for j in range(l):
                a, b = affines[j]
                z = apply_conv(j + 1, nn.relu(a * z + b))
            wc = w[:, s0:s0 + chunk, :, None]
            s_ = jnp.sum(wc * z, axis=(0, 1, 2))
            q_ = jnp.sum(wc * (z * z), axis=(0, 1, 2))
            if l == L - 1:
                m = sel[:, s0:s0 + chunk, :, None]
                zmx = jnp.max(jnp.where(m, z, -jnp.inf), axis=2)
                zmn = jnp.min(jnp.where(m, z, jnp.inf), axis=2)
                return s_, q_, zmx, zmn
            return s_, q_

        remat = (lambda f: f) if init else jax.checkpoint
        affines = []
        mx_chunks, mn_chunks = [], []
        for l in range(L):
            acc_s = jnp.zeros((convs[l].features,), xyz.dtype)
            acc_q = jnp.zeros((convs[l].features,), xyz.dtype)
            for s0 in range(0, S, chunk):
                res = remat(partial(stats_chunk, l, s0))(affines)
                if l == L - 1:
                    s_, q_, zmx, zmn = res
                    mx_chunks.append(zmx)
                    mn_chunks.append(zmn)
                else:
                    s_, q_ = res
                acc_s = acc_s + s_
                acc_q = acc_q + q_
            affines.append(pbns[l].finalize(acc_s, acc_q, count))

        a, b = affines[-1]
        mx = jnp.concatenate(mx_chunks, axis=1)  # [B, S, C_last]
        mn = jnp.concatenate(mn_chunks, axis=1)
        pooled = jnp.where(a >= 0, mx, mn)
        return nn.relu(a * pooled + b)

    def _dense_scale(self, xyz, points, new_xyz, sqrdists, radius, k, convs, bns):
        """Gather-free scale: masked dense pairs, chunked over centroids."""
        B, N, _ = xyz.shape
        S = new_xyz.shape[1]
        D = points.shape[-1]

        mask = sqrdists <= radius**2
        rank = jnp.cumsum(mask, axis=-1) - mask  # exclusive prefix count
        sel = mask & (rank < k)
        # a centroid with no in-radius point falls back to point 0, like the
        # clamped reference behavior
        empty = ~jnp.any(mask, axis=-1)
        sel = sel | (empty[..., None] & (jnp.arange(N) == 0))

        # First layer split: conv0([f_n, x_n - c_s]) is linear, so evaluate
        # the per-point half u_n = conv0([f_n, x_n]) and the per-centroid
        # half v_s = conv0([0, c_s]); u - v cancels the bias, which the
        # zero-input call restores: z[s, n] = u_n - v_s + b.
        u = convs[0](jnp.concatenate([points, xyz], axis=-1))           # [B,N,C1]
        v = convs[0](
            jnp.concatenate([jnp.zeros((B, S, D), xyz.dtype), new_xyz], axis=-1)
        )
        zero_bias = convs[0](jnp.zeros((1, 1, D + 3), xyz.dtype))       # [1,1,C1] = b

        chunk = max(1, min(self.dense_chunk, S))
        outs = []
        for s0 in range(0, S, chunk):
            z = u[:, None, :, :] - v[:, s0 : s0 + chunk, None, :] + zero_bias[:, None]
            h = nn.relu(bns[0](z))
            for conv, bn in zip(convs[1:], bns[1:]):
                h = nn.relu(bn(conv(h)))
            m = sel[:, s0 : s0 + chunk, :, None]
            outs.append(jnp.max(jnp.where(m, h, -jnp.inf), axis=2))
        return jnp.concatenate(outs, axis=1)


class SetAbstractionAll(nn.Module):
    """Global set abstraction (``group_all=True``): one group over all points,
    Dense/BN/ReLU stack, max-pool -> [B, 1, mlp[-1]]."""

    mlp: Sequence[int]
    bf16: bool = False  # see ModelConfig.bf16_train
    bf16_eval: bool = False  # see ModelConfig.bf16_eval

    @nn.compact
    def __call__(
        self, xyz: jax.Array, points: Optional[jax.Array], train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        bf16_ev = self.bf16_eval and not train and not self.is_initializing()
        dt = jnp.bfloat16 if ((self.bf16 and train) or bf16_ev) else None
        bn_dt = jnp.bfloat16 if bf16_ev else None
        new_xyz, grouped = group_all(xyz, points)  # [B, 1, N, 3+D]
        x = grouped
        for j, width in enumerate(self.mlp):
            x = nn.Dense(width, dtype=dt, name=f"conv_{j}")(x)
            x = _bn(train, f"bn_{j}", dtype=bn_dt)(x)
            x = nn.relu(x)
        return new_xyz, jnp.max(x, axis=2)  # [B, 1, width]


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance feature propagation + pointwise Dense/BN/ReLU.

    The 3-NN interpolation itself always stays f32 (distance math); under
    ``bf16`` only the Dense stack computes in bfloat16 during training."""

    mlp: Sequence[int]
    bf16: bool = False  # see ModelConfig.bf16_train
    bf16_eval: bool = False  # see ModelConfig.bf16_eval

    @nn.compact
    def __call__(
        self,
        xyz1: jax.Array,            # [B, N, 3] dense positions
        xyz2: jax.Array,            # [B, S, 3] coarse positions
        points1: Optional[jax.Array],  # [B, N, D1] dense features (skip link)
        points2: jax.Array,         # [B, S, D2] coarse features
        train: bool = False,
    ) -> jax.Array:
        bf16_ev = self.bf16_eval and not train and not self.is_initializing()
        dt = jnp.bfloat16 if ((self.bf16 and train) or bf16_ev) else None
        bn_dt = jnp.bfloat16 if bf16_ev else None
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
            x = nn.Dense(width, dtype=dt, name=f"conv_{j}")(x)
            x = _bn(train, f"bn_{j}", dtype=bn_dt)(x)
            x = nn.relu(x)
        return x


def attention_block(key: jax.Array, value: jax.Array, query: jax.Array) -> jax.Array:
    """Class-space attention (``TEHNet.py:13-27``), channels-last.

    key   [B, N, KC]  — per-event class logits (KC = num classes)
    value [B, N, C]   — fused per-event features
    query [B, N, C]   — per-hand query projection of the features

    sim = softmax_over_classes(key^T @ query / sqrt(C)) : [B, KC, C]
    out[b, n, k] = sum_c sim[b, k, c] * value[b, n, c]  : [B, N, KC]

    Scale quirk: the reference computes ``N, KC = key.shape[:2]`` and then
    immediately shadows both with ``N, KC = value.shape[:2]``
    (``TEHNet.py:14-22``), so the ``KC ** -.5`` applied to ``sim_map`` is the
    VALUE channel count (256), not the class count (4).  Released ``.pth``
    checkpoints were trained with the 256**-0.5 scale; we reproduce it.
    """
    c = value.shape[-1]
    sim = jnp.einsum("bnk,bnc->bkc", key, query) * (c**-0.5)
    sim = jax.nn.softmax(sim, axis=1)  # over the class axis, like the reference
    return jnp.einsum("bkc,bnc->bnk", sim, value)


class QueryConv(nn.Module):
    """Per-hand query head: two k=3 convs over the (time-sorted) event axis
    with ReLU/BN/Dropout between (``TEHNet.py:150-166``).

    Layout [B, N, C]; torch Sequential slots are conv0,relu,bn0,drop,conv1,bn1.
    """

    features: int = 256
    dropout: float = 0.1
    bf16: bool = False  # see ModelConfig.bf16_train
    bf16_eval: bool = False  # see ModelConfig.bf16_eval

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bf16_ev = self.bf16_eval and not train and not self.is_initializing()
        dt = jnp.bfloat16 if ((self.bf16 and train) or bf16_ev) else None
        bn_dt = jnp.bfloat16 if bf16_ev else None
        x = nn.Conv(self.features, kernel_size=(3,), padding="SAME",
                    dtype=dt, name="conv_0")(x)
        x = nn.relu(x)
        x = _bn(train, "bn_0", dtype=bn_dt)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.features, kernel_size=(3,), padding="SAME",
                    dtype=dt, name="conv_1")(x)
        x = _bn(train, "bn_1", dtype=bn_dt)(x)
        return x
