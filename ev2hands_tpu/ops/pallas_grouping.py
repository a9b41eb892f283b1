"""Fused Pallas kernels for dense multi-scale grouping.

PRODUCTION (v2, ``dense_msg_scale_pallas_2d``): strictly 2-D per-centroid
tiles — wired into ``SetAbstractionMsg`` for the scales where it measured
faster than the XLA dense path (TEHNet sa1 scales 2-3 on v5e: 24 -> 20 ms
each at B=32; full pipeline 315 -> 350 windows/s).  v1's diagnosed wall was
Mosaic's 3-D elementwise broadcast/mask/max lowering; v2 never creates a
3-D tensor: per centroid, subtract/relu is a [N, C] VPU op, the conv chain
is two [N, C] @ [C, C'] MXU dots, and the masked pool is a 2-D row max.
The selection mask (first-K-in-radius + point-0 fallback) is precomputed in
XLA (``dense_selection_mask``) — one cheap d2 matmul + cumsum.

Measured (device-timed scan, B=32, N=2048, S=512):
  sa1 scale3 (64/96/128): v2 19.8 ms vs XLA 23.8 ms  (1.20x)
  sa1 scale2 (64/64/128): v2 19.9 ms vs XLA 23.9 ms  (1.20x)
  sa1 scale1 (32/32/64):  v2 20.1 ms vs XLA  7.1 ms  (0.36x — XLA kept)
  regressor scales (128/*/256, S=128): tie (1.01-1.02x — XLA kept)
  v3 (scratch assembly + one big dot per layer): 23-28 ms — the VMEM
  store/load roundtrip costs more than v2's small-dot issue overhead.

The v1 kernel below (3-D tiles, in-kernel rank) is kept as the documented
exploration that motivated v2. HISTORICAL NOTE for v1:

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
(~28 ms vs ~10 ms per sa1 scale at B=32). Two designs were measured: a 3-D
grid with cross-step scratch accumulators (33 ms/scale, 4096 grid steps) and
the current 2-D grid with an inner fori over N sub-tiles (28 ms/scale, 256
steps) — the time is invariant to channel width and grid-step count, so the
cost sits in Mosaic's lowering of the 3-D elementwise broadcast/mask/max
chain (layout relayouts), not dispatch or the MXU. Kept as a documented
exploration + test target; NOT wired into the model. Revisit when Mosaic
improves 3-D elementwise tiling, or restructure to 2-D [Sb*nb, C] layouts
end-to-end.

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
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl



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
    xyz_ref,      # [1, N, 3]  — FULL point set resident in VMEM
    cxyz_ref,     # [1, Sb, 3]
    u_ref,        # [1, N, C1]
    v_ref,        # [1, Sb, C1]
    W2_ref, b2_ref, W3_ref, b3_ref,
    out_ref,      # [1, Sb, C3]
    *,
    radius: float,
    nsample: int,
    nb: int,      # inner sub-tile size along N
):
    """One (batch, centroid-block) grid step: the inner fori loop walks the N
    axis in ``nb``-sized sub-tiles, so per-grid-step dispatch overhead is
    amortized 16x vs a 3-D grid and all pair tensors stay in VMEM."""
    N = xyz_ref.shape[1]
    Sb = cxyz_ref.shape[1]
    C3 = out_ref.shape[2]
    n_sub = N // nb

    c = cxyz_ref[0]      # [Sb, 3]
    v = v_ref[0]         # [Sb, C1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    tri = (rows <= cols).astype(jnp.float32)

    def body(i, carry):
        acc, count, f0 = carry
        x = xyz_ref[0, pl.ds(i * nb, nb), :]   # [nb, 3]
        u = u_ref[0, pl.ds(i * nb, nb), :]     # [nb, C1]

        # exact f32 distances on the VPU (an MXU dot may flip the boundary)
        diff = c[:, None, :] - x[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)     # [Sb, nb]
        maskf = (d2 <= radius * radius).astype(jnp.float32)

        # inclusive prefix count via triangular matmul (no Mosaic cumsum)
        inc = jnp.dot(maskf, tri, preferred_element_type=jnp.float32)
        rank = count + inc - maskf             # exclusive
        self_f = maskf * (rank < nsample).astype(jnp.float32)
        count = count + inc[:, -1:]

        z = jax.nn.relu(u[None, :, :] - v[:, None, :])  # [Sb, nb, C1]
        C1 = z.shape[-1]
        h = jax.nn.relu(
            jnp.dot(z.reshape(Sb * nb, C1), W2_ref[...],
                    preferred_element_type=jnp.float32) + b2_ref[...]
        )
        h = jax.nn.relu(
            jnp.dot(h, W3_ref[...], preferred_element_type=jnp.float32)
            + b3_ref[...]
        ).reshape(Sb, nb, -1)

        f0 = jnp.where(i == 0, h[:, 0, :], f0)  # fallback: point 0's features
        masked = h + ((self_f - 1.0) * 1e30)[:, :, None]
        acc = jnp.maximum(acc, jnp.max(masked, axis=1))
        return acc, count, f0

    acc, count, f0 = jax.lax.fori_loop(
        0, n_sub, body,
        (
            jnp.full((Sb, C3), -jnp.inf, jnp.float32),
            jnp.zeros((Sb, 1), jnp.float32),
            jnp.zeros((Sb, C3), jnp.float32),
        ),
    )
    emptyf = (count == 0).astype(jnp.float32)
    out_ref[0] = emptyf * f0 + (1.0 - emptyf) * acc


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

    grid = (B, S // sb)
    out = pl.pallas_call(
        functools.partial(_kernel, radius=radius, nsample=nsample, nb=nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, sb, 3), lambda b, s: (b, s, 0)),
            pl.BlockSpec((1, N, C1), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, sb, C1), lambda b, s: (b, s, 0)),
            pl.BlockSpec((C1, C2), lambda b, s: (0, 0)),
            pl.BlockSpec((C2,), lambda b, s: (0,)),
            pl.BlockSpec((C2, C3), lambda b, s: (0, 0)),
            pl.BlockSpec((C3,), lambda b, s: (0,)),
        ],
        out_specs=pl.BlockSpec((1, sb, C3), lambda b, s: (b, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C3), jnp.float32),
        interpret=interpret,
    )(
        xyz, new_xyz, folded.u, folded.v,
        folded.W2, folded.b2, folded.W3, folded.b3,
    )
    return out


# ---------------------------------------------------------------------------
# v2: strictly 2-D per-centroid tiles
# ---------------------------------------------------------------------------

def _kernel_2d(
    u_ref,       # [1, N, C1]  per-point first layer, VMEM-resident
    v_ref,       # [1, Sb, C1] per-centroid first layer
    sel_ref,     # [1, Sb, N]  float32 selection mask (incl. empty fallback)
    W2_ref, b2_ref, W3_ref, b3_ref,
    out_ref,     # [1, Sb, C3]
):
    """One (batch, centroid-block) grid step with NO 3-D tensors anywhere:
    the centroid loop is a static python unroll; each iteration is a 2-D
    [N, C] chain — subtract/relu on the VPU, two [N, C] @ [C, C'] dots on
    the MXU, masked max over rows.  This is the restructuring the v1 STATUS
    note calls for: v1's cost was Mosaic's 3-D broadcast/mask/max lowering,
    which this layout never creates."""
    u = u_ref[0]                     # [N, C1]
    sb = v_ref.shape[1]
    for j in range(sb):              # static unroll
        z = jax.nn.relu(u - v_ref[0, j, :][None, :])          # [N, C1]
        h = jax.nn.relu(
            jnp.dot(z, W2_ref[...], preferred_element_type=jnp.float32)
            + b2_ref[...]
        )                                                      # [N, C2]
        h = jax.nn.relu(
            jnp.dot(h, W3_ref[...], preferred_element_type=jnp.float32)
            + b3_ref[...]
        )                                                      # [N, C3]
        m = sel_ref[0, j, :][:, None]                          # [N, 1]
        out_ref[0, j, :] = jnp.max(h + (m - 1.0) * 1e30, axis=0)


def dense_selection_mask(
    xyz: jax.Array, new_xyz: jax.Array, radius: float, nsample: int
) -> jax.Array:
    """[B, S, N] float32 mask: first ``nsample`` in-radius points by index,
    with the reference's point-0 fallback for empty neighborhoods.  Cheap
    XLA work (one d2 matmul + cumsum) done outside the Pallas kernel."""
    hi = jax.lax.Precision.HIGHEST
    d2 = (
        jnp.sum(new_xyz**2, -1)[:, :, None]
        + jnp.sum(xyz**2, -1)[:, None, :]
        - 2.0 * jnp.einsum("bsc,bnc->bsn", new_xyz, xyz, precision=hi)
    )
    mask = d2 <= radius * radius
    rank = jnp.cumsum(mask, axis=-1) - mask
    sel = mask & (rank < nsample)
    empty = ~jnp.any(mask, axis=-1)
    sel = sel | (empty[..., None] & (jnp.arange(xyz.shape[1]) == 0))
    return sel.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("sb", "interpret")
)
def dense_msg_scale_pallas_2d(
    folded: FoldedScale,
    sel: jax.Array,       # [B, S, N] from dense_selection_mask
    sb: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """-> [B, S, C3] pooled features for one scale (2-D tile design)."""
    B, N, C1 = folded.u.shape
    S = folded.v.shape[1]
    C2 = folded.W2.shape[-1]
    C3 = folded.W3.shape[-1]
    assert S % sb == 0, (S, sb)

    grid = (B, S // sb)
    return pl.pallas_call(
        _kernel_2d,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C1), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, sb, C1), lambda b, s: (b, s, 0)),
            pl.BlockSpec((1, sb, N), lambda b, s: (b, s, 0)),
            pl.BlockSpec((C1, C2), lambda b, s: (0, 0)),
            pl.BlockSpec((C2,), lambda b, s: (0,)),
            pl.BlockSpec((C2, C3), lambda b, s: (0, 0)),
            pl.BlockSpec((C3,), lambda b, s: (0,)),
        ],
        out_specs=pl.BlockSpec((1, sb, C3), lambda b, s: (b, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C3), jnp.float32),
        interpret=interpret,
    )(folded.u, folded.v, sel, folded.W2, folded.b2, folded.W3, folded.b3)


def _kernel_2d_batched(
    u_ref,       # [1, N, C1]
    v_ref,       # [1, Sb, C1]
    sel_ref,     # [1, Sb, N] float32
    W2_ref, b2_ref, W3_ref, b3_ref,
    out_ref,     # [1, Sb, C3]
    z_scr,       # [Sb*N, C1] VMEM scratch
):
    """v3: per-centroid 2-D subtract/relu tiles assembled into one scratch
    matrix, then a single [Sb*N, C] @ [C, C'] dot per layer — the MXU sees
    one large matmul instead of Sb small ones (v2's per-centroid dots were
    issue-bound: ~constant 20 ms regardless of channel width)."""
    u = u_ref[0]                              # [N, C1]
    sb = v_ref.shape[1]
    N = u.shape[0]
    for j in range(sb):
        z_scr[pl.ds(j * N, N), :] = jax.nn.relu(u - v_ref[0, j, :][None, :])
    h = jax.nn.relu(
        jnp.dot(z_scr[...], W2_ref[...], preferred_element_type=jnp.float32)
        + b2_ref[...]
    )                                          # [Sb*N, C2]
    h = jax.nn.relu(
        jnp.dot(h, W3_ref[...], preferred_element_type=jnp.float32)
        + b3_ref[...]
    )                                          # [Sb*N, C3]
    for j in range(sb):
        m = sel_ref[0, j, :][:, None]
        out_ref[0, j, :] = jnp.max(
            h[j * N : (j + 1) * N, :] + (m - 1.0) * 1e30, axis=0
        )


@functools.partial(jax.jit, static_argnames=("sb", "interpret"))
def dense_msg_scale_pallas_2d_batched(
    folded: FoldedScale,
    sel: jax.Array,
    sb: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """-> [B, S, C3]; v3 of the fused grouping kernel (see _kernel_2d_batched)."""
    from jax.experimental.pallas import tpu as pltpu

    B, N, C1 = folded.u.shape
    S = folded.v.shape[1]
    C2 = folded.W2.shape[-1]
    C3 = folded.W3.shape[-1]
    assert S % sb == 0, (S, sb)

    return pl.pallas_call(
        _kernel_2d_batched,
        grid=(B, S // sb),
        in_specs=[
            pl.BlockSpec((1, N, C1), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, sb, C1), lambda b, s: (b, s, 0)),
            pl.BlockSpec((1, sb, N), lambda b, s: (b, s, 0)),
            pl.BlockSpec((C1, C2), lambda b, s: (0, 0)),
            pl.BlockSpec((C2,), lambda b, s: (0,)),
            pl.BlockSpec((C2, C3), lambda b, s: (0, 0)),
            pl.BlockSpec((C3,), lambda b, s: (0,)),
        ],
        out_specs=pl.BlockSpec((1, sb, C3), lambda b, s: (b, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C3), jnp.float32),
        scratch_shapes=[pltpu.VMEM((sb * N, C1), jnp.float32)],
        interpret=interpret,
    )(folded.u, folded.v, sel, folded.W2, folded.b2, folded.W3, folded.b3)
