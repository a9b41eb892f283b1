"""A/B: RANK-COMPACTION ball-query selection vs the production top_k.

The selection is stream compaction: the j-th selected neighbor of a query
is the (j+1)-th in-radius point by original index. With the inclusive
in-radius rank r[n] = cumsum(mask)[n] (non-decreasing along n), that
point's index is recoverable WITHOUT any sort as a count:

    idx[j] = #{ n : r[n] <= j }

(positions strictly before the (j+1)-th selected one are exactly those
whose inclusive rank is still <= j). This replaces the production
O(N log^2 N) bitonic top_k (`ops/pointnet.query_ball_point`,
`scripts/ab_select.py`: 7.55 ms for the three sa1 scales at B=8) with a
cumsum + an O(N*K) broadcast-compare-reduce on the VPU.

Variants, all asserted EXACT against query_ball_point (incl. backfill
and clamp semantics, ``pointnet2_utils.py:87-107``):

  * topk_i32   — production baseline (single top_k on i32 scores)
  * rank_cmp   — cumsum + sum_n(rank <= j) compare-reduce
  * rank_cmp_shared — same but ONE cumsum shared across the 3 radii?
                 (each radius has its own mask -> own rank; nothing
                 shareable — instead this fuses the three compare-reduces
                 over a stacked scale axis to give XLA one bigger kernel)

Run on the real TPU with an idle host: python scripts/ab_rank_select.py
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def rank_select(sq: jax.Array, r: float, K: int) -> jax.Array:
    """Exact query_ball_point via rank compaction. sq [B,S,N] -> [B,S,K]."""
    N = sq.shape[-1]
    mask = sq <= r * r
    rank = jnp.cumsum(mask, axis=-1, dtype=jnp.int32)   # inclusive, [B,S,N]
    cnt = rank[..., -1:]                                # [B,S,1]
    j = jnp.arange(K, dtype=jnp.int32)
    idx = jnp.sum((rank[..., None] <= j).astype(jnp.int32), axis=2)
    first = idx[..., :1]
    idx = jnp.where(j < cnt, idx, first)   # backfill w/ first in-radius idx
    # all-empty neighborhoods leave idx == N (rank stays 0), so the clamp
    # lands on N-1 exactly like the top_k path
    return jnp.minimum(idx, N - 1)


def rank_select_stacked(sq: jax.Array, scales) -> jax.Array:
    """All scales' compare-reduces stacked on one leading axis; K slots
    padded to max K so XLA sees a single fused reduce, then re-sliced."""
    N = sq.shape[-1]
    Kmax = max(K for _, K in scales)
    ranks = jnp.stack(
        [jnp.cumsum(sq <= r * r, axis=-1, dtype=jnp.int32)
         for r, _ in scales], 0)                        # [3,B,S,N]
    cnt = ranks[..., -1:]
    j = jnp.arange(Kmax, dtype=jnp.int32)
    idx = jnp.sum((ranks[..., None] <= j).astype(jnp.int32), axis=3)
    first = idx[..., :1]
    idx = jnp.where(j < cnt, idx, first)
    idx = jnp.where(cnt > 0, idx, 0)
    idx = jnp.minimum(idx, N - 1)                       # [3,B,S,Kmax]
    return jnp.concatenate(
        [idx[i, ..., :K] for i, (_, K) in enumerate(scales)], -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--s", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from ev2hands_tpu.ops.pallas_ops import fps_auto
    from ev2hands_tpu.ops.pointnet import (
        index_points,
        query_ball_point,
        square_distance,
    )
    from ev2hands_tpu.utils.profiling import device_throughput

    B, N, S = args.batch, args.n, args.s
    SCALES = ((0.1, 32), (0.2, 64), (0.4, 128))  # TEHNet sa1

    rng = np.random.RandomState(0)
    xyz0 = jnp.asarray(np.clip(rng.randn(B, N, 3) * 0.4, -1, 1), jnp.float32)

    def sqrdists_of(k):
        xyz = xyz0 + jax.random.normal(k, (B, N, 3)) * 1e-3
        fps_idx = fps_auto(xyz, S)
        new_xyz = index_points(xyz, fps_idx)
        return square_distance(new_xyz, xyz)

    def base(k):
        return sqrdists_of(k).sum()

    def sel_topk(k):
        sq = sqrdists_of(k)
        return jnp.concatenate(
            [query_ball_point(r, K, xyz0, xyz0[:, :S], sqrdists=sq)
             for r, K in SCALES], -1)

    def sel_rank(k):
        sq = sqrdists_of(k)
        return jnp.concatenate(
            [rank_select(sq, r, K) for r, K in SCALES], -1)

    def sel_rank_stacked(k):
        return rank_select_stacked(sqrdists_of(k), SCALES)

    # exactness vs the production path (same key -> same sqrdists)
    key = jax.random.PRNGKey(7)
    ref = np.asarray(sel_topk(key))
    for name, fn in [("rank_cmp", sel_rank),
                     ("rank_stacked", sel_rank_stacked)]:
        got = np.asarray(fn(key))
        assert (got == ref).all(), (
            f"{name} mismatch: {np.argwhere(got != ref)[:5]}")
    print(json.dumps({"exactness": "ok"}), flush=True)

    variants = [
        ("base_fps_sqrdists", base),
        ("topk_i32", sel_topk),
        ("rank_cmp", sel_rank),
        ("rank_stacked", sel_rank_stacked),
    ]
    results = {name: [] for name, _ in variants}
    for rep in range(args.reps):
        for name, fn in variants:
            ms = device_throughput(
                fn, key=jax.random.PRNGKey(rep * 97 + 13), iters=args.iters
            ) * 1e3
            results[name].append(round(ms, 3))
            print(json.dumps({"rep": rep, "variant": name,
                              "ms": round(ms, 3)}), flush=True)

    base_ms = min(results["base_fps_sqrdists"])
    summary = {
        name: {"ms": results[name],
               "delta_ms": round(min(results[name]) - base_ms, 3)}
        for name, _ in variants
    }
    out = {"config": {"B": B, "N": N, "S": S}, "summary": summary}
    print(json.dumps(out))
    with open("artifacts/ab_rank_select.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
