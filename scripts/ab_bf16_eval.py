"""On-TPU A/B for mixed-precision INFERENCE (ModelConfig.bf16_eval).

Full jitted inference pipeline (device ERPC -> TEHNet forward -> both MANO
hands) with the dense-path conv/BN chains in f32 vs bfloat16, interleaved
reps to factor out slow-tunnel drift, at the B=16 headline and the B=32
production eval batch. The sa1 sparse Pallas kernel already runs bf16 MXU
dots in both configs; this measures the remaining dense chains (sa2,
regressor sa1s, sa3, fp, classifier, query convs).

Counterpart of scripts/ab_bf16.py (the training-side A/B; +18% there).
Accuracy gate lives in scripts/learn_artifact.py (--eval_bf16), which
evaluates f32-trained params through both eval paths at full sandbox scale.

Run on the REAL TPU with an otherwise-idle host:
    python scripts/ab_bf16_eval.py [--out artifacts/ab_bf16_eval.json]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import bench as B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--batches", type=int, nargs="*", default=[16, 32])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    B.wait_for_tpu()
    rows = []
    for batch in args.batches:
        for rep in range(args.reps):
            for kw in ({"bf16_eval": False}, {"bf16_eval": True}):
                ws, _, _, mfu_ex, _ = B.measure_ours(batch_size=batch, **kw)
                row = {"batch": batch, "rep": rep, **kw,
                       "windows_per_s": round(ws, 1),
                       "mfu_executed_pct": round(mfu_ex, 2)}
                rows.append(row)
                print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows}, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
