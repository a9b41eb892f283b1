"""Ev2Hands-R real-benchmark evaluation.

Re-design of ``src/Ev2Hands/evaluate_ev2hands_r.py``: per-recording sliding
2 ms windows (1 ms advance), batched jitted inference, per-frame PCK/AUC
(0-100 mm), root-relative MPJPE, and the non-collision score computed with
the TPU collision kernel instead of the CUDA BVH
(``compute_non_collision_score``, ``evaluate_ev2hands_r.py:128-160``).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ev2hands_tpu.config import Config, DEFAULT_CONFIG
from ev2hands_tpu.events.erpc import erpc_real_batch_transform
from ev2hands_tpu.events.real_streams import RealStream
from ev2hands_tpu.metrics import (
    absolute_pck3d,
    get_auc,
    mpjpe,
    relative_pck3d,
    right_root_relative_pck3d,
)
from ev2hands_tpu.model import TEHNet, apply_mano
from ev2hands_tpu.ops.collision import collision_percentage
from ev2hands_tpu.train import build_collision_context, build_hands, create_train_state


def make_real_eval_step(net: TEHNet, hands, ctx, cfg: Config):
    sensor = cfg.sensor

    def fn(state, events, valid, key):
        erpc = erpc_real_batch_transform(
            events, valid, key,
            width=sensor.width, height=sensor.height, n_out=cfg.model.n_points,
        )
        outputs = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            erpc.events, train=False,
        )
        outputs = apply_mano(hands, outputs)
        pred_j = jnp.stack([outputs["left"]["j3d"], outputs["right"]["j3d"]], 1)
        pred_v_l = outputs["left"]["vertices"]
        pred_v_r = outputs["right"]["vertices"]
        noncol = 100.0 - collision_percentage(
            pred_v_l * 1000, pred_v_r * 1000, ctx.faces, ctx.adjacency,
            max_pairs=256,
        )
        return pred_j * 1000.0, noncol

    return jax.jit(fn)


def evaluate_recording(
    eval_step, state, stream: RealStream, cfg: Config,
    batch_size: int = 32, num_steps: int = 100, max_windows: int = None,
) -> Dict:
    """Stream a recording through sliding windows; per-window scores.

    Window assembly (pickle slicing, undistortion, tail padding) runs in a
    background thread (``Prefetcher`` over ``sliding_window_batches``) so the
    host pipeline overlaps with device inference — the reference gets the
    same overlap from ``DataLoader(num_workers=cpu_count)``
    (``evaluate_ev2hands_r.py:187``)."""
    import time

    from ev2hands_tpu.events.real_streams import sliding_window_batches
    from ev2hands_tpu.events.streams import Prefetcher

    pck_abs = np.zeros(num_steps + 1)
    pck_rel = np.zeros(num_steps + 1)
    pck_rrr = np.zeros(num_steps + 1)
    mpjpe_vals: List[float] = []
    noncol_vals: List[float] = []
    root_distances: List[float] = []  # min GT inter-hand joint distance (mm),
    frames = 0                        # cf. evaluate_ev2hands_r.py:81
    key = jax.random.PRNGKey(0)
    t_start = time.perf_counter()

    batches = Prefetcher(
        sliding_window_batches(stream, batch_size, max_windows, with_gt=True)
    )
    for b in batches:
        k = b["n_valid"]
        ev = jnp.asarray(b["events"])
        va = jnp.asarray(b["event_valid"])
        gt = jnp.asarray(b["j3d"]) * 1000.0  # m -> mm
        pred, noncol = eval_step(state, ev, va, jax.random.fold_in(key, frames))
        pred, gt, noncol = pred[:k], gt[:k], noncol[:k]
        pck_abs += np.asarray(jnp.sum(absolute_pck3d(pred, gt, num_steps, 100.0), 0))
        pck_rel += np.asarray(jnp.sum(relative_pck3d(pred, gt, num_steps, 100.0), 0))
        pck_rrr += np.asarray(
            jnp.sum(right_root_relative_pck3d(pred, gt, num_steps, 100.0), 0)
        )
        mpjpe_vals.extend(np.asarray(mpjpe(pred, gt)).tolist())
        noncol_vals.extend(np.asarray(noncol).tolist())
        gt_np = np.asarray(gt)
        root_distances.extend(
            np.linalg.norm(gt_np[:, 0] - gt_np[:, 1], axis=-1).min(-1).tolist()
        )
        frames += k

    elapsed = time.perf_counter() - t_start
    f = max(frames, 1)
    return {
        "frames": frames,
        # end-to-end: host windowing + device inference + metric accumulation
        "windows_per_sec_end_to_end": frames / max(elapsed, 1e-9),
        "mpjpe_mm": float(np.mean(mpjpe_vals)) if mpjpe_vals else float("nan"),
        "non_collision_pct": float(np.mean(noncol_vals)) if noncol_vals else float("nan"),
        "root_distance_mm": root_distances,
        "auc": {
            "absolute": get_auc(pck_abs / f),
            "relative": get_auc(pck_rel / f),
            "right_root_relative": get_auc(pck_rrr / f),
        },
        "pck3d": {
            "absolute": (pck_abs / f).tolist(),
            "relative": (pck_rel / f).tolist(),
            "right_root_relative": (pck_rrr / f).tolist(),
        },
    }


def main():
    ap = argparse.ArgumentParser(description="Evaluate on Ev2Hands-R recordings")
    ap.add_argument("--data_root", required=True,
                    help="directory of .pickle recordings (one per subject)")
    ap.add_argument("--checkpoint_path", required=True)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--max_windows", type=int, default=None)
    ap.add_argument("--out_dir", default="outputs/ev2hands_r")
    ap.add_argument("--synthetic_mano", action="store_true")
    args = ap.parse_args()

    cfg = DEFAULT_CONFIG
    hands_obj = build_hands(cfg, synthetic=args.synthetic_mano)
    hands = {s: h.params for s, h in hands_obj.items()}
    ctx = build_collision_context(hands_obj)
    net = TEHNet(cfg=cfg.model)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), optax.adam(1e-3))

    from ev2hands_tpu.evaluate import load_checkpoint_into_state

    state = load_checkpoint_into_state(args.checkpoint_path, state)
    eval_step = make_real_eval_step(net, hands, ctx, cfg)

    os.makedirs(args.out_dir, exist_ok=True)
    results = {}
    paths = (
        [args.data_root] if not os.path.isdir(args.data_root)
        else [os.path.join(args.data_root, p) for p in sorted(os.listdir(args.data_root))]
    )
    for path in paths:
        subject = os.path.splitext(os.path.basename(path))[0]
        stream = RealStream(path, cfg.sensor.width, cfg.sensor.height)
        results[subject] = evaluate_recording(
            eval_step, state, stream, cfg, args.batch_size,
            max_windows=args.max_windows,
        )
        with open(os.path.join(args.out_dir, f"{subject}.pickle"), "wb") as f:
            pickle.dump(results[subject], f)
        print(json.dumps({subject: {k: results[subject][k] for k in
                                    ("frames", "mpjpe_mm", "non_collision_pct", "auc")}}))

    summary = {
        "mean_mpjpe_mm": float(np.nanmean([r["mpjpe_mm"] for r in results.values()])),
        "mean_non_collision_pct": float(
            np.nanmean([r["non_collision_pct"] for r in results.values()])
        ),
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
