"""End-to-end framework smoke: generate -> stitch -> train -> eval -> demo.

Exercises every pipeline stage on real hardware with synthetic MANO model
data (no licensed assets needed):
  1. datagen: MANO sequences -> software-rasterized frames -> ESIM events
     (device) -> pickle parts -> stitched H5 dataset;
  2. training: jitted train step on the generated data, loss trend reported;
  3. evaluation: PCK/AUC + MPJPE on the same data;
  4. real-data path: synthetic Ev2Hands-R recording -> streaming demo video.

Usage: python scripts/e2e_smoke.py [--iters 100] [--out /tmp/e2e]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--out", default="/tmp/e2e_smoke")
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.datagen.generate import generate
    from ev2hands_tpu.datagen.stitch import stitch
    from ev2hands_tpu.events.streams import Ev2HandSReader, Prefetcher
    from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.train import (
        build_collision_context,
        create_train_state,
        evaluate,
        make_eval_step,
        make_train_step,
    )

    cfg = DEFAULT_CONFIG
    os.makedirs(args.out, exist_ok=True)
    report = {}

    # ---- 1. generate a small dataset with the full device pipeline --------
    t0 = time.time()
    models = synthetic_mano_models(0)
    rng = np.random.RandomState(0)

    def make_sequence(n):
        frames = []
        for i in range(n):
            hands = []
            for side, x0 in (("left", -0.08), ("right", 0.08)):
                pose = np.zeros(48, np.float32)
                pose[:3] = [0.3 * np.sin(i / 7), 0.4 * i / n, 0.2 * np.cos(i / 9)]
                pose[3:] = 0.2 * np.sin(np.arange(45) + i / 5)
                hands.append({
                    "hand_type": side,
                    "pose": pose,
                    "shape": (0.3 * rng.randn(10)).astype(np.float32),
                    "trans": np.asarray(
                        [x0 + 0.05 * np.sin(i / 6), 0.04 * np.cos(i / 8), -0.45],
                        np.float32),
                })
            frames.append(hands)
        return frames

    parts = generate(
        iter([make_sequence(args.frames)]), models,
        os.path.join(args.out, "parts"), mode="train", cfg=cfg,
        frames_per_part=32, verbose=False,
    )
    root = stitch(parts, os.path.join(args.out, "train"))
    import h5py

    with h5py.File(f"{root}.h5") as f:
        n_events = len(f["event"])
    report["datagen"] = {
        "frames": args.frames, "events": int(n_events),
        "seconds": round(time.time() - t0, 1),
    }
    print(f"[1/4] generated {n_events} events from {args.frames} frames "
          f"in {report['datagen']['seconds']}s", flush=True)
    assert n_events > 10_000, "datagen produced too few events"

    # ---- 2. train on it ----------------------------------------------------
    t0 = time.time()
    hands_obj = create_mano_hands(models, cfg.mano.n_pose_comps)
    hands = {s: h.params for s, h in hands_obj.items()}
    ctx = build_collision_context(hands_obj)
    net = TEHNet(cfg=cfg.model)
    optimizer = optax.adam(1e-3)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), optimizer)
    step = make_train_step(net, hands, ctx, cfg, optimizer, augment=True)

    reader = Ev2HandSReader(root, n_events=cfg.model.n_points)
    key = jax.random.PRNGKey(1)
    hist = []
    for it, batch in enumerate(Prefetcher(reader.batches(8, shuffle=True))):
        if it >= args.iters:
            break
        state, losses = step(state, batch, key)
        if (it + 1) % 20 == 0:
            hist.append(float(losses["loss"]))
            print(f"  it {it + 1}: loss {hist[-1]:.2f}", flush=True)
    assert np.isfinite(hist).all(), "training diverged"
    report["train"] = {
        "iters": args.iters, "loss_curve": [round(h, 2) for h in hist],
        "seconds": round(time.time() - t0, 1),
    }
    print(f"[2/4] trained {args.iters} iters in {report['train']['seconds']}s",
          flush=True)

    # ---- 3. evaluate -------------------------------------------------------
    t0 = time.time()
    eval_step = make_eval_step(net, hands, cfg)
    metrics, score = evaluate(eval_step, state, reader, cfg, max_frames=64)
    report["eval"] = {
        "relative_auc": score, "auc": metrics["auc"],
        "seconds": round(time.time() - t0, 1),
    }
    print(f"[3/4] eval: {metrics['auc']} in {report['eval']['seconds']}s",
          flush=True)

    # ---- 4. real-data path: demo video ------------------------------------
    t0 = time.time()
    from ev2hands_tpu.demo import run_demo
    from ev2hands_tpu.events.real_streams import write_synthetic_ev2hands_r

    rec = write_synthetic_ev2hands_r(
        os.path.join(args.out, "subject.pickle"), n_events=60_000, n_frames=30)
    video, n = run_demo(rec, checkpoint_path="",
                        out_path=os.path.join(args.out, "demo.mp4"),
                        batch_size=8, max_windows=16, synthetic_mano=True)
    report["demo"] = {
        "frames": n, "video_bytes": os.path.getsize(video),
        "seconds": round(time.time() - t0, 1),
    }
    print(f"[4/4] demo: {n} frames, {report['demo']['video_bytes']} bytes "
          f"in {report['demo']['seconds']}s", flush=True)

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
