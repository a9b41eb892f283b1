"""Fused Pallas kernel for dense multi-scale grouping. EXPERIMENTAL.

One kernel per SA-MSG scale computes, entirely in VMEM tiles:
  pairwise distances -> in-radius mask -> running first-K-by-index rank
  selection -> 3-layer pointwise conv chain (BatchNorm pre-folded into
  affine weights) -> masked max-pool over the neighborhood.

This removes the XLA dense path's HBM round trips of the [B, S, N, C] pair
tensors (tens of GB per scale at B=32, N=2048) — only u/v point features,
coordinates, and the [B, S, C_out] result touch HBM.

STATUS (v5e, jax 0.9 Mosaic): numerically correct (exact in interpret mode;
~1e-2 absolute on-device from MXU bf16 input passes in the conv matmuls) but
*slower* than the XLA dense path in ``model.layers.SetAbstractionMsg``
(~33 ms vs ~10 ms per sa1 scale at B=32) — per-grid-step overhead dominates
at the VMEM-feasible tile sizes (sb=32, nb=256; larger tiles exceed the 16 MB
scoped VMEM limit). Kept as a documented exploration + test target; NOT wired
into the model. Revisit with per-step double-buffered DMA and channel-padded
matmuls.

Semantics are identical to ``SetAbstractionMsg`` dense mode (and therefore to
the reference's gather formulation in eval): neighbors are the first
``nsample`` in-radius points by index; centroids with an empty neighborhood
fall back to point 0. Inference-only (the training path uses gather mode).

Layer folding (done by the caller, see ``fold_scale_params``):
  layer1: relu(a1*(conv1([f, x-c]) ) + c1) == relu(u'_n - v'_s)
          with u' = a1*(W1.[f,x] + b1) + c1 and v' = a1*(W1_x.c)
  layer k>1: relu(x @ Wk' + bk') with BN folded into Wk', bk'.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FoldedScale(NamedTuple):
    u: jax.Array    # [B, N, C1] per-point first layer (BN-folded)
    v: jax.Array    # [B, S, C1] per-centroid first layer (BN-folded)
    W2: jax.Array   # [C1, C2]
    b2: jax.Array   # [C2]
    W3: jax.Array   # [C2, C3]
    b3: jax.Array   # [C3]


def fold_bn_affine(scale, bias, mean, var, eps=1e-5):
    """BN(x) = a*x + c with a = scale/sqrt(var+eps), c = bias - a*mean."""
    a = scale / jnp.sqrt(var + eps)
    return a, bias - a * mean


def fold_scale_params(points, xyz, new_xyz, conv_params, bn_params, eps=1e-5):
    """Precompute the FoldedScale inputs from raw conv/bn params.

    conv_params/bn_params: lists of 3 dicts with 'kernel'/'bias' and
    'scale'/'bias' + batch_stats 'mean'/'var'.
    """
    (c1, c2, c3) = conv_params
    (n1, n2, n3) = bn_params

    a1, d1 = fold_bn_affine(n1["scale"], n1["bias"], n1["mean"], n1["var"], eps)
    D = points.shape[-1]
    Wf, Wx = c1["kernel"][:D], c1["kernel"][D:]
    hi = jax.lax.Precision.HIGHEST
    u = jnp.einsum("bnd,dc->bnc", points, Wf, precision=hi) + jnp.einsum(
        "bnd,dc->bnc", xyz, Wx, precision=hi
    )
    u = a1 * (u + c1["bias"]) + d1
    v = a1 * jnp.einsum("bsd,dc->bsc", new_xyz, Wx, precision=hi)

    a2, d2 = fold_bn_affine(n2["scale"], n2["bias"], n2["mean"], n2["var"], eps)
    W2 = c2["kernel"] * a2[None, :]
    b2 = a2 * c2["bias"] + d2

    a3, d3 = fold_bn_affine(n3["scale"], n3["bias"], n3["mean"], n3["var"], eps)
    W3 = c3["kernel"] * a3[None, :]
    b3 = a3 * c3["bias"] + d3

    return FoldedScale(u=u, v=v, W2=W2, b2=b2, W3=W3, b3=b3)


def _kernel(
    xyz_ref,      # [1, Nb, 3]
    cxyz_ref,     # [1, Sb, 3]
    u_ref,        # [1, Nb, C1]
    v_ref,        # [1, Sb, C1]
    W2_ref, b2_ref, W3_ref, b3_ref,
    out_ref,      # [1, Sb, C3]
    acc_ref,      # scratch [Sb, C3] f32
    count_ref,    # scratch [Sb, 1] f32 (running in-radius count)
    f0_ref,       # scratch [Sb, C3] f32 (fallback: features of point 0)
    *,
    radius: float,
    nsample: int,
    n_blocks: int,
):
    nb = pl.program_id(2)

    @pl.when(nb == 0)
    def _init():
        acc_ref[...] = jnp.full(acc_ref.shape, -jnp.inf, jnp.float32)
        count_ref[...] = jnp.zeros(count_ref.shape, jnp.float32)

    x = xyz_ref[0]       # [Nb, 3]
    c = cxyz_ref[0]      # [Sb, 3]
    # exact f32 distances on the VPU: an MXU dot here may run reduced
    # precision and flip the in-radius mask at the boundary, changing the
    # selected neighbor set
    diff = c[:, None, :] - x[None, :, :]           # [Sb, Nb, 3]
    d2 = jnp.sum(diff * diff, axis=-1)             # [Sb, Nb]
    maskf = (d2 <= radius * radius).astype(jnp.float32)

    # inclusive prefix count via triangular matmul (Mosaic has no cumsum):
    # inc[s, j] = sum_{i<=j} mask[s, i] = mask @ upper_triangular_ones
    Nb_ = maskf.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Nb_, Nb_), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Nb_, Nb_), 1)
    tri = (rows <= cols).astype(jnp.float32)
    inc = jnp.dot(maskf, tri, preferred_element_type=jnp.float32)
    rank = count_ref[...] + inc - maskf                      # exclusive
    self_f = maskf * (rank < nsample).astype(jnp.float32)    # [Sb, Nb]
    count_ref[...] = count_ref[...] + inc[:, -1:]

    z = jax.nn.relu(u_ref[0][None, :, :] - v_ref[0][:, None, :])  # [Sb, Nb, C1]
    Sb, Nb, C1 = z.shape
    h = jax.nn.relu(
        jnp.dot(z.reshape(Sb * Nb, C1), W2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    )
    h = jax.nn.relu(
        jnp.dot(h, W3_ref[...], preferred_element_type=jnp.float32) + b3_ref[...]
    ).reshape(Sb, Nb, -1)

    @pl.when(nb == 0)
    def _save_fallback():
        f0_ref[...] = h[:, 0, :]

    # arithmetic masking (Mosaic dislikes bool reshapes/broadcasts):
    # unselected lanes get -1e30 added before the max
    masked = h + ((self_f - 1.0) * 1e30)[:, :, None]
    acc_ref[...] = jnp.maximum(acc_ref[...], jnp.max(masked, axis=1))

    @pl.when(nb == n_blocks - 1)
    def _finish():
        emptyf = (count_ref[...] == 0).astype(jnp.float32)  # [Sb, 1]
        out_ref[0] = emptyf * f0_ref[...] + (1.0 - emptyf) * acc_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("radius", "nsample", "sb", "nb", "interpret"),
)
def dense_msg_scale_pallas(
    xyz: jax.Array,       # [B, N, 3]
    new_xyz: jax.Array,   # [B, S, 3]
    folded: FoldedScale,
    radius: float,
    nsample: int,
    sb: int = 32,
    nb: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """-> [B, S, C3] pooled features for one scale."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    C1 = folded.u.shape[-1]
    C2 = folded.W2.shape[-1]
    C3 = folded.W3.shape[-1]
    assert S % sb == 0 and N % nb == 0, (S, sb, N, nb)
    n_blocks = N // nb

    grid = (B, S // sb, n_blocks)
    out = pl.pallas_call(
        functools.partial(
            _kernel, radius=radius, nsample=nsample, n_blocks=n_blocks
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nb, 3), lambda b, s, n: (b, n, 0)),
            pl.BlockSpec((1, sb, 3), lambda b, s, n: (b, s, 0)),
            pl.BlockSpec((1, nb, C1), lambda b, s, n: (b, n, 0)),
            pl.BlockSpec((1, sb, C1), lambda b, s, n: (b, s, 0)),
            pl.BlockSpec((C1, C2), lambda b, s, n: (0, 0)),
            pl.BlockSpec((C2,), lambda b, s, n: (0,)),
            pl.BlockSpec((C2, C3), lambda b, s, n: (0, 0)),
            pl.BlockSpec((C3,), lambda b, s, n: (0,)),
        ],
        out_specs=pl.BlockSpec((1, sb, C3), lambda b, s, n: (b, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C3), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((sb, C3), jnp.float32),
            pltpu.VMEM((sb, 1), jnp.float32),
            pltpu.VMEM((sb, C3), jnp.float32),
        ],
        interpret=interpret,
    )(
        xyz, new_xyz, folded.u, folded.v,
        folded.W2, folded.b2, folded.W3, folded.b3,
    )
    return out
