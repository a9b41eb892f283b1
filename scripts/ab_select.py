"""A/B: XLA formulations of the ball-query SELECTION (first-K in-radius by
lowest index) — the biggest single term of the train-step forward machinery
(3x top_k = 8.6 ms of the 73 ms B=8 step, scripts/group_breakdown.py).

The selection is stream compaction, not ordering: scores are the point
indices themselves where in-radius (``ops/pointnet.query_ball_point``), so a
full top_k is algorithmically overkill. Candidates measured here, all EXACT
(first-K-smallest overall is contained in the union of per-chunk
first-K-smallest):

  * topk_i32   — production: one lax.top_k per scale on int32 scores
  * topk_f32   — same, scores cast to f32 before top_k (TPU sorts compare
                 bitcast-int anyway; measures whether dtype changes the
                 lowering)
  * two_stage  — per-scale: reshape N into chunks, top_k(min(K, chunk))
                 within each chunk, then top_k(K) over the concatenated
                 chunk winners. Cuts the sorted-row length from N to
                 n_chunks*K at the price of a second (small) top_k.

Reference semantics being reproduced: ``pointnet2_utils.py:87-107``.
Run on the real TPU with an idle host: python scripts/ab_select.py
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def two_stage_select(scores: jax.Array, k: int, chunk: int) -> jax.Array:
    """Exact k-smallest (ascending) of each row via chunked partial top_k.

    scores [..., N] -> [..., k] ascending. Any element among the global
    k smallest is among its own chunk's k smallest, so stage 2 sees every
    winner. Sentinel rows (score N) propagate like the single-call path.
    """
    *lead, N = scores.shape
    n_chunks = N // chunk
    ch = scores.reshape(*lead, n_chunks, chunk)
    k1 = min(k, chunk)
    neg1, _ = jax.lax.top_k(-ch, k1)                    # [..., n_chunks, k1]
    cand = neg1.reshape(*lead, n_chunks * k1)
    neg2, _ = jax.lax.top_k(cand, k)                    # largest of negated
    return -neg2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--s", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from ev2hands_tpu.ops.pallas_ops import fps_auto
    from ev2hands_tpu.ops.pointnet import index_points, square_distance
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

    arange_i = jnp.arange(N, dtype=jnp.int32)
    arange_f = jnp.arange(N, dtype=jnp.float32)

    def base(k):
        # fps + sqrdists prefix, shared by every variant; deltas below
        # subtract its time
        return sqrdists_of(k).sum()

    def sel_topk_i32(k):
        sq = sqrdists_of(k)
        outs = []
        for r, K in SCALES:
            sc = jnp.where(sq <= r * r, arange_i, N)
            neg, _ = jax.lax.top_k(-sc, K)
            outs.append(-neg)
        return jnp.concatenate(outs, -1)

    def sel_topk_f32(k):
        sq = sqrdists_of(k)
        outs = []
        for r, K in SCALES:
            sc = jnp.where(sq <= r * r, arange_f, float(N))
            neg, _ = jax.lax.top_k(-sc, K)
            outs.append((-neg).astype(jnp.int32))
        return jnp.concatenate(outs, -1)

    def make_two_stage(chunk):
        def sel(k):
            sq = sqrdists_of(k)
            outs = []
            for r, K in SCALES:
                sc = jnp.where(sq <= r * r, arange_i, N)
                outs.append(two_stage_select(sc, K, chunk))
            return jnp.concatenate(outs, -1)
        return sel

    # exactness first (tiny trace, same shapes)
    key = jax.random.PRNGKey(7)
    ref = np.asarray(sel_topk_i32(key))
    for name, fn in [("topk_f32", sel_topk_f32),
                     ("two_stage_256", make_two_stage(256)),
                     ("two_stage_512", make_two_stage(512))]:
        got = np.asarray(fn(key))
        assert (got == ref).all(), f"{name} mismatch"
    print(json.dumps({"exactness": "ok"}), flush=True)

    variants = [
        ("base_fps_sqrdists", base),
        ("topk_i32", sel_topk_i32),
        ("topk_f32", sel_topk_f32),
        ("two_stage_256", make_two_stage(256)),
        ("two_stage_512", make_two_stage(512)),
    ]
    results = {name: [] for name, _ in variants}
    for rep in range(args.reps):
        for name, fn in variants:
            ms = device_throughput(
                fn, key=jax.random.PRNGKey(rep * 97 + 13), iters=args.iters
            ) * 1e3
            results[name].append(round(ms, 3))
            print(json.dumps({"rep": rep, "variant": name, "ms": round(ms, 3)}),
                  flush=True)

    base_ms = min(results["base_fps_sqrdists"])
    summary = {
        name: {"ms": results[name],
               "delta_ms": round(min(results[name]) - base_ms, 3)}
        for name, _ in variants
    }
    print(json.dumps({"config": {"B": B, "N": N, "S": S}, "summary": summary}))


if __name__ == "__main__":
    main()
