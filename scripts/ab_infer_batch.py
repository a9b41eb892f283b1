"""A/B: inference-pipeline throughput vs batch size.

For SERVING, batch is a free knob — if the pipeline amortizes fixed
per-batch costs (FPS scans, kernel launches, ERPC sort) at larger B, the
serving configuration should use it. Verdict (artifacts/ab_infer_batch.json):
B=16 is the sweet spot, and round 4 moved bench.py's headline to it (B=32,
the through-round-3 headline batch, stays published as
eval_b32_windows_per_sec). Reuses bench.measure_ours: the full jitted
pipeline (key -> ERPC -> TEHNet -> MANO) with hoist-proof key-perturbed
on-device timing.

Run on the real TPU with an idle host: python scripts/ab_infer_batch.py
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from bench import measure_ours, wait_for_tpu  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[16, 32, 64, 128])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    wait_for_tpu()
    out = {}
    for rep in range(args.reps):
        for b in args.batches:
            wps, _, _, _, _ = measure_ours(batch_size=b, iters=args.iters)
            out.setdefault(b, []).append(round(wps, 1))
            print(json.dumps({"rep": rep, "batch": b,
                              "windows_per_s": round(wps, 1)}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
