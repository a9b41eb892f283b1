"""Block-sparse one-hot MXU gather for grouped neighbors (TPU Pallas).

The gather-mode training forward materializes each centroid's selected
neighbors with ``index_points(src, cat_idx)`` — a [B, S, sum(K)] row gather
that XLA lowers to the TPU's native lane gather at a measured ~18 ns/row
(16.7 ms for the sa1 scales at B=8, N=2048: the single largest op of the
train step). On TPU, a one-hot contraction on the MXU beats lane gathers
(the same trade that makes ``three_nn_interpolate`` and the Pallas FPS fast),
*if* the contraction is restricted to the few Morton-contiguous point tiles a
centroid's radius ball actually touches — a full [K, N] one-hot per centroid
would stream more MXU rows than the lane gather costs.

Exactness (this path must be bitwise-identical to ``index_points``):
a float32 value splits exactly into three bf16 terms (Dekker-style:
``hi = bf16(x)``; the residual ``x - hi`` is exact in f32 and holds <= 16
significant bits; two more bf16 terms capture it exactly). The three terms
ride as *stacked output channels* of a single bf16 MXU pass — one [K, nb] @
[nb, 3C] dot per active tile, f32 accumulation — and the final
``hi + mid + lo`` re-sum is exact because the terms occupy disjoint mantissa
segments. No extra MXU passes for exactness (the lane padding was idle
anyway for C <= 42), so the cost stays ~(rows x active-tiles) M-cycles.

The caller provides indices as positions into a Morton-permuted point axis;
``query_ball_point_permuted`` (ops/pointnet.py) produces them with the
reference's selection semantics intact (K lowest *original* indices,
ascending slot order — ``pointnet2_utils.py:87-107``) by packing the original
index as the top_k score while the columns ride in Morton order.

Reference being replaced: the grouping gathers at
``/root/reference/src/Ev2Hands/model/pointnet2_utils.py:168-196``.

STATUS (TPU v5e, honest key-perturbed timing — kept as a tested,
default-off exploration):
  * op level (scripts/ab_pallas_gather.py --op-only, sa1 shapes B=8
    N=2048 S=512 on gaussian clouds): ball-query+gather old 15.1 ms vs
    new 20.1 ms — the kernel loses already here (activity on gaussian
    clouds is high for the r=0.4 scale); sa2 wide shapes are a wash
    (4.06 vs 4.03 ms).
  * full train step (scripts/ab_pallas_gather.py --step-only): off
    115.3/118.3 w/s vs on 108.3/106.9 — see ModelConfig.pallas_gather.
  * bitwise caveat: the kernel's GATHER is bitwise-equal to
    ``index_points`` given the same positions (tested in interpret mode
    and on-chip), but a pipeline that recomputes sqrdists in the
    PERMUTED layout (as the op-level A/B and the model's use_pgather
    branch do) can flip radius-boundary membership by one float ulp vs
    the original-layout sqrdists, selecting a different neighbor for a
    handful of boundary pairs. Sharing one sqrdists tensor across both
    formulations keeps selection identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def split3_bf16(src: jax.Array, seg: int | None = None) -> jax.Array:
    """f32 [..., C] -> bf16 [..., 3*seg] with ``hi|mid|lo`` stacked on the
    channel axis and ``hi + mid + lo == src`` exactly (for normal floats;
    f32 subnormals below the bf16 subnormal range would lose bits — point
    coordinates and event features are O(1)).

    ``seg`` (default C) zero-pads each of the three terms to ``seg``
    channels so wide sources can align every segment to a 128-lane
    boundary — in-kernel lane slices at multiples of 128 avoid the
    cross-lane relayout a slice at ``C=323`` would cost."""
    hi = src.astype(jnp.bfloat16)
    r1 = src - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    if seg is not None and seg != src.shape[-1]:
        pad = [(0, 0)] * (src.ndim - 1) + [(0, seg - src.shape[-1])]
        hi, mid, lo = (jnp.pad(t, pad) for t in (hi, mid, lo))
    return jnp.concatenate([hi, mid, lo], axis=-1)


def _seg_width(C: int) -> int:
    """Segment width of the hi|mid|lo stack: contiguous when the whole
    stack fits one 128-lane pass (sa1's C=8 -> 24 lanes), else each term
    padded to a 128-lane boundary (sa2's C=323 -> seg=384) so the kernel's
    per-segment slices stay lane-aligned."""
    return C if 3 * C <= 128 else -(-C // 128) * 128


def pos_tile_activity(pos: jax.Array, nb: int, n: int) -> jax.Array:
    """pos [B, S, K] positions into an n-point axis -> [B, S, n//nb] int32:
    1 where the nb-point tile holds at least one of the centroid's slots."""
    nt = n // nb
    t = pos // nb
    return jnp.max(
        (t[..., None] == jnp.arange(nt, dtype=pos.dtype)).astype(jnp.int32),
        axis=2,
    )


def _kernel(act_ref, idx_ref, src3_ref, out_ref, *, nb: int, C: int,
            resum: bool):
    """Per centroid: visit only active point tiles; one bf16 MXU dot per
    tile gathers all K slots at once (hi|mid|lo stacked as 3C lanes).

    ``resum`` (wide path, 3C > 128, C a 128-multiple) folds hi+mid+lo
    inside the kernel with lane-aligned slices. The narrow path emits the
    full [K, 3C] stack instead — with 3C <= 128 it occupies the same padded
    128-lane vregs/output tiles as [K, C], and slicing at lane offsets C,
    2C (not 128-aligned) would cost Mosaic a cross-lane relayout per tile
    (or fail to lower); the exact re-sum happens in XLA outside."""
    sb = idx_ref.shape[1]
    K = idx_ref.shape[2]
    nt = src3_ref.shape[1] // nb
    oc = out_ref.shape[3]                  # C when resum, else 3C

    for j in range(sb):                    # static unroll over centroids
        out_ref[0, j, :, :] = jnp.zeros((K, oc), jnp.float32)

        def body(ti, _, j=j):
            @pl.when(act_ref[0, j, ti] > 0)
            def _():
                # idx rides as [K, 1] (K on sublanes) straight from the DMA —
                # a [K]-lane load reshaped in-kernel would relayout per tile
                local = idx_ref[0, j, :, :] - ti * nb              # [K, 1]
                oh = (
                    local
                    == jax.lax.broadcasted_iota(jnp.int32, (K, nb), 1)
                ).astype(jnp.bfloat16)                             # [K, nb]
                t = src3_ref[0, pl.ds(ti * nb, nb), :]             # [nb, 3C]
                g3 = jnp.dot(oh, t, preferred_element_type=jnp.float32)
                if resum:
                    g3 = g3[:, :C] + g3[:, C : 2 * C] + g3[:, 2 * C :]
                # slots outside this tile contribute exact zeros — the
                # accumulation across tiles is disjoint
                out_ref[0, j, :, :] = out_ref[0, j, :, :] + g3

            return 0

        jax.lax.fori_loop(0, nt, body, 0)


@functools.partial(jax.jit, static_argnames=("nb", "sb", "interpret"))
def _onehot_gather(
    src: jax.Array,   # [B, N, C] float32 (rows in the caller's point order)
    idx: jax.Array,   # [B, S, K] int32 positions into N
    act: jax.Array,   # [B, S, N//nb] int32 tile activity (pos_tile_activity)
    nb: int = 128,
    sb: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """-> [B, S, K, C] f32, bitwise-equal to ``index_points(src, idx)``.

    Wide sources (3*C > 128, e.g. sa2's C=323) pad each hi|mid|lo term to a
    128-lane boundary (``_seg_width``) — the dot is one [K, nb] @ [nb, 3*seg]
    MXU pass per active tile either way, just wider."""
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = src.shape
    S, K = idx.shape[1], idx.shape[2]
    assert N % nb == 0 and S % sb == 0, (N, nb, S, sb)
    seg = _seg_width(C)
    nt = N // nb
    resum = 3 * seg > 128        # wide: lane-aligned in-kernel hi+mid+lo
    oc = seg if resum else 3 * seg

    src3 = split3_bf16(src, seg=seg)
    out = pl.pallas_call(
        functools.partial(_kernel, nb=nb, C=seg, resum=resum),
        grid=(B, S // sb),
        in_specs=[
            pl.BlockSpec((1, sb, nt), lambda b, s: (b, s, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sb, K, 1), lambda b, s: (b, s, 0, 0)),
            pl.BlockSpec((1, N, 3 * seg), lambda b, s: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sb, K, oc), lambda b, s: (b, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, K, oc), jnp.float32),
        interpret=interpret,
    )(act, idx[..., None], src3)
    if resum:
        return out if seg == C else out[..., :C]
    # narrow (seg == C): exact re-sum outside the kernel — each slot's value
    # lives in exactly one tile, so the per-segment accumulators hold one
    # nonzero term each and hi + mid + lo here is bitwise the source value
    return out[..., :C] + out[..., C : 2 * C] + out[..., 2 * C :]


def _scatter_kernel(act_ref, idx_ref, g3_ref, out_ref, *, nb: int, C: int,
                    resum: bool):
    """Transpose of ``_kernel``: the full [N, C] cotangent block stays
    resident across the centroid-chunk grid (consecutive revisits, init at
    chunk 0); for each centroid x active tile, one bf16 MXU dot
    (``oh^T [nb, K] @ g3 [K, 3C]``) scatter-adds all K slot cotangents into
    the tile's rows. Slots hitting the same point row accumulate in the
    MXU's f32 accumulator — same math as XLA's scatter-add up to float
    summation order. Narrow C (``resum=False``) keeps the [N, 3C]
    per-segment accumulators and re-sums outside, like ``_kernel`` — the
    slices at lane offsets C, 2C are not 128-aligned."""
    sb = idx_ref.shape[1]
    K = idx_ref.shape[2]
    N = out_ref.shape[1]
    nt = N // nb
    oc = out_ref.shape[2]                  # C when resum, else 3C

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0, :, :] = jnp.zeros((N, oc), jnp.float32)

    for j in range(sb):                    # static unroll over centroids

        def body(ti, _, j=j):
            @pl.when(act_ref[0, j, ti] > 0)
            def _():
                local = idx_ref[0, j, :][None, :] - ti * nb        # [1, K]
                oh_t = (
                    jax.lax.broadcasted_iota(jnp.int32, (nb, K), 0) == local
                ).astype(jnp.bfloat16)                              # [nb, K]
                g3 = g3_ref[0, j, :, :]                             # [K, 3C]
                d3 = jnp.dot(oh_t, g3, preferred_element_type=jnp.float32)
                if resum:
                    d3 = d3[:, :C] + d3[:, C : 2 * C] + d3[:, 2 * C :]
                rows = pl.ds(ti * nb, nb)
                out_ref[0, rows, :] = out_ref[0, rows, :] + d3

            return 0

        jax.lax.fori_loop(0, nt, body, 0)


@functools.partial(jax.jit, static_argnames=("n", "nb", "sb", "interpret"))
def _onehot_scatter_add(
    g: jax.Array,     # [B, S, K, C] f32 cotangents of the gathered tensor
    idx: jax.Array,   # [B, S, K] int32 positions into N
    act: jax.Array,   # [B, S, N//nb] int32 tile activity
    n: int,
    nb: int = 128,
    sb: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """-> [B, N, C] f32: sum of slot cotangents per source row (the gather
    VJP), on the MXU instead of XLA's sequential scatter-add. Wide C pads
    the hi|mid|lo terms to 128-lane segments like the forward."""
    from jax.experimental.pallas import tpu as pltpu

    B, S, K, C = g.shape
    assert n % nb == 0 and S % sb == 0, (n, nb, S, sb, C)
    seg = _seg_width(C)
    resum = 3 * seg > 128
    oc = seg if resum else 3 * seg

    g3 = split3_bf16(g, seg=seg)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, nb=nb, C=seg, resum=resum),
        grid=(B, S // sb),
        in_specs=[
            pl.BlockSpec((1, sb, n // nb), lambda b, s: (b, s, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sb, K), lambda b, s: (b, s, 0)),
            pl.BlockSpec((1, sb, K, 3 * seg), lambda b, s: (b, s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, oc), lambda b, s: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n, oc), jnp.float32),
        interpret=interpret,
    )(act, idx, g3)
    if resum:
        return out if seg == C else out[..., :C]
    return out[..., :C] + out[..., C : 2 * C] + out[..., 2 * C :]


def _gather_transpose(g: jax.Array, idx: jax.Array, n: int) -> jax.Array:
    """VJP of the row gather w.r.t. src: scatter-add the cotangents. XLA's
    own scatter-add lowering for gather gradients measured fine in the full
    train step (a custom sort-based VJP measured SLOWER — see CLAUDE.md);
    keep it for the backward."""
    B = g.shape[0]
    C = g.shape[-1]
    gflat = g.reshape(B, -1, C)
    iflat = idx.reshape(B, -1)
    return jax.vmap(
        lambda gg, ii: jnp.zeros((n, C), gg.dtype).at[ii].add(gg)
    )(gflat, iflat)


def grouped_gather(
    src: jax.Array,
    idx: jax.Array,
    act: jax.Array,
    nb: int = 128,
    sb: int = 8,
    bwd: str = "xla",
    interpret: bool = False,
) -> jax.Array:
    """Differentiable block-sparse one-hot gather: forward on the MXU
    (bitwise-equal to ``index_points(src, idx)``); backward either through
    XLA's scatter-add (``bwd='xla'``) or the transposed one-hot kernel
    (``bwd='pallas'`` — same float math up to summation order). idx/act are
    non-differentiable."""
    n = src.shape[1]
    assert bwd in ("xla", "pallas"), bwd

    @jax.custom_vjp
    def f(s):
        return _onehot_gather(s, idx, act, nb=nb, sb=sb, interpret=interpret)

    def fwd(s):
        return f(s), None

    def bwd_fn(_, g):
        if bwd == "pallas":
            return (_onehot_scatter_add(
                g, idx, act, n, nb=nb, sb=sb, interpret=interpret
            ),)
        return (_gather_transpose(g, idx, n),)

    f.defvjp(fwd, bwd_fn)
    return f(src)
