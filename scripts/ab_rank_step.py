"""Step-level A/B for ModelConfig.rank_ball_query (sort-free ball query).

Op-level (scripts/ab_rank_select.py): the cumsum-rank compaction beats the
production single-top_k selection 6.84 vs 8.73 ms on the three sa1 scales
(B=8, N=2048, S=512), with bitwise-identical indices. The repo's rule is
that op-level wins must survive the FULL jitted train step before a
default flips (pallas_gather and the custom index_points VJP both won at
op level and lost at step level), so this measures the published
train-step number with the knob off/on, interleaved reps, at B=8 and
B=16, plus a bf16_train cross at B=8.

Run on the REAL TPU with an otherwise-idle host:
    python scripts/ab_rank_step.py
"""

import json
import sys

sys.path.insert(0, ".")

import bench as B


def main():
    cfgs = [
        {"rank_ball_query": False},
        {"rank_ball_query": True},
        {"rank_ball_query": True, "bf16_train": True},
        {"rank_ball_query": False, "bf16_train": True},
    ]
    results = []
    for batch in (8, 16):
        for rep in range(2):
            for kw in cfgs:
                if batch == 16 and kw.get("bf16_train"):
                    continue
                ws = B.measure_train_step(batch_size=batch, **kw)
                row = {"batch": batch, "rep": rep, **kw,
                       "train_windows_per_s": round(ws, 1)}
                results.append(row)
                print(json.dumps(row), flush=True)
    with open("artifacts/ab_rank_step.json", "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
