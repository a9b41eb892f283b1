"""On-TPU A/B of eval grouping formulations per layer (full pipeline).

The production eval path is dense/sparse: the sa1 sparse kernels stream
~activity x nb point-rows per centroid (whole tiles), while the gather
formulation touches exactly the K=224 selected slots — with the one-hot MXU
gather (ops/pallas_gather.py) replacing the ~18 ns/row lane gather, the
gather formulation may win the big scales. Eval numerics of the formulations
are identical (test_dense_grouping_matches_gather); this measures the full
inference pipeline (key -> ERPC -> model -> MANO, hoist-proof) per config.

Run on the REAL TPU with an otherwise-idle host:
    python scripts/ab_eval_grouping.py [--batch 32] [--configs a,b,...]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

CONFIGS = {
    # production baseline: all dense, sa1 on the sparse kernel
    "dense_all": {},
    # sa1 via one-hot-gather formulation, rest dense
    "sa1_gather": {"grouping_sa1": "gather", "pallas_gather": True},
    # sa1 + regressor heads via one-hot gather
    "sa1_reg_gather": {
        "grouping_sa1": "gather", "grouping_regressor": "gather",
        "pallas_gather": True,
    },
    # everything gather — sa2 rides the wide-channel kernel path
    # (pallas_gather_wide defaults on; 128-lane hi|mid|lo segments)
    "all_gather": {"grouping": "gather", "pallas_gather": True},
    # same but sa2 on the plain XLA index_points gather: isolates whether
    # the wide-C kernel pays for itself at sa2's small shapes (N=512, S=128)
    "all_gather_nowide": {
        "grouping": "gather", "pallas_gather": True,
        "pallas_gather_wide": False,
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--configs", type=str, default=",".join(CONFIGS))
    ap.add_argument("--repeat", type=int, default=2,
                    help="interleaved repeats to factor out tunnel drift")
    args = ap.parse_args()

    import bench as B

    names = [c for c in args.configs.split(",") if c]
    for rep in range(args.repeat):
        for name in names:
            ws, _, _, _, _ = B.measure_ours(
                batch_size=args.batch, iters=args.iters, n_points=args.n,
                **CONFIGS[name],
            )
            print(json.dumps({"rep": rep, "config": name,
                              "windows_per_s": round(ws, 1)}), flush=True)


if __name__ == "__main__":
    main()
