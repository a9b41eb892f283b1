"""Learning-dynamics artifact: does the full pipeline actually LEARN?

Generates a synthetic Ev2Hands-S dataset with the device datagen pipeline
(MANO -> software rasterizer -> ESIM events), trains the production train
step on it for --iters iterations, and evaluates on a HELD-OUT generated
split at checkpoints. The committed artifact (artifacts/learn_curve.json)
records the loss curve and the eval trajectory (relative-PCK AUC, MPJPE,
segmentation accuracy) so "the framework trains end-to-end and the metrics
improve" is an evidenced claim, not an assumption — the 100-iter e2e smoke
only proves the plumbing.

Reference counterpart: the 800k-iteration pretrain loop
(/root/reference/src/Ev2Hands/train.py:22-151) with eval-and-save-on-best
(:100-126); this is the same loop at sandbox scale on synthetic assets.

Run on the real TPU with an idle host (~10-15 min):
    python scripts/learn_artifact.py --iters 2000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_sequence(rng, n, phase=0.0):
    frames = []
    for i in range(n):
        hands = []
        for side, x0 in (("left", -0.08), ("right", 0.08)):
            pose = np.zeros(48, np.float32)
            pose[:3] = [0.3 * np.sin(i / 7 + phase), 0.4 * i / n,
                        0.2 * np.cos(i / 9 + phase)]
            pose[3:] = 0.2 * np.sin(np.arange(45) + i / 5 + phase)
            hands.append({
                "hand_type": side,
                "pose": pose,
                "shape": (0.3 * rng.randn(10)).astype(np.float32),
                "trans": np.asarray(
                    [x0 + 0.05 * np.sin(i / 6 + phase),
                     0.04 * np.cos(i / 8 + phase), -0.45], np.float32),
            })
        frames.append(hands)
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--eval_every", type=int, default=400)
    ap.add_argument("--train_frames", type=int, default=180)
    ap.add_argument("--val_frames", type=int, default=45)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/learn_artifact")
    ap.add_argument("--bf16", action="store_true",
                    help="train with ModelConfig.bf16_train (the +18%% "
                         "mixed-precision path); evidences accuracy "
                         "neutrality of the bf16 conv chains")
    args = ap.parse_args()

    import jax
    import optax

    from bench import wait_for_tpu
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

    wait_for_tpu()
    cfg = DEFAULT_CONFIG
    if args.bf16:
        import dataclasses

        cfg = cfg.replace(model=dataclasses.replace(cfg.model, bf16_train=True))
    os.makedirs(args.out, exist_ok=True)
    report = {"config": {"iters": args.iters, "batch": args.batch,
                         "train_frames": args.train_frames,
                         "val_frames": args.val_frames,
                         "bf16_train": bool(args.bf16)}}

    # ---- datagen: train + held-out val splits -----------------------------
    t0 = time.time()
    models = synthetic_mano_models(0)
    rng = np.random.RandomState(0)
    n_seq = max(1, args.train_frames // 60)
    train_parts = generate(
        iter([make_sequence(rng, 60, phase=1.7 * j) for j in range(n_seq)]),
        models, os.path.join(args.out, "parts_train"), mode="train", cfg=cfg,
        frames_per_part=32, verbose=False,
    )
    train_root = stitch(train_parts, os.path.join(args.out, "train"))
    val_parts = generate(
        iter([make_sequence(rng, args.val_frames, phase=9.1)]), models,
        os.path.join(args.out, "parts_val"), mode="val", cfg=cfg,
        frames_per_part=32, verbose=False,
    )
    val_root = stitch(val_parts, os.path.join(args.out, "val"))
    report["datagen_seconds"] = round(time.time() - t0, 1)
    print(f"datagen done in {report['datagen_seconds']}s", flush=True)

    # ---- training loop with periodic held-out eval -------------------------
    hands_obj = create_mano_hands(models, cfg.mano.n_pose_comps)
    hands = {s: h.params for s, h in hands_obj.items()}
    ctx = build_collision_context(hands_obj)
    net = TEHNet(cfg=cfg.model)
    optimizer = optax.adam(1e-3)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), optimizer)
    step = make_train_step(net, hands, ctx, cfg, optimizer, augment=True)
    eval_step = make_eval_step(net, hands, cfg)

    train_reader = Ev2HandSReader(train_root, n_events=cfg.model.n_points)
    val_reader = Ev2HandSReader(val_root, n_events=cfg.model.n_points)

    # Number of deterministic eval batches that tile the WHOLE held-out
    # stream with non-overlapping windows (batches() advances starts by
    # n_events): the single-batch MPJPE of rounds <=3 bounced between eval
    # points (one batch = 32 of ~45 windows, high variance); full-split
    # stats are stable.
    val_limit = max(val_reader.n_samples - val_reader.n_events, 1)
    n_val_batches = max(1, int(np.ceil(
        val_limit / (cfg.train.eval_batch_size * val_reader.n_events))))

    def run_eval(state, tag, step_fn=None):
        step_fn = step_fn or eval_step
        t = time.time()
        metrics, score = evaluate(step_fn, state, val_reader, cfg,
                                  max_frames=128)
        # MPJPE over ALL held-out windows (deterministic, non-overlapping
        # tiling of the val stream; eval_step returns pred/gt joints in mm)
        preds, gts = [], []
        for i, batch in enumerate(val_reader.batches(
                cfg.train.eval_batch_size, shuffle=False,
                max_batches=n_val_batches)):
            p_, g_ = step_fn(state, batch, jax.random.PRNGKey(i))
            preds.append(np.asarray(p_))
            gts.append(np.asarray(g_))
        pred, gt = np.concatenate(preds), np.concatenate(gts)  # [B,2,21,3] mm
        mpjpe_mm = float(np.mean(np.linalg.norm(pred - gt, axis=-1)))
        # split the absolute error into its translation and pose parts:
        # root_err isolates the regressed-transl drift; the root-aligned
        # MPJPE tracks the same root-relative pose the AUC score does
        root_err_mm = float(np.mean(np.linalg.norm(
            pred[:, :, :1] - gt[:, :, :1], axis=-1)))
        mpjpe_rel_mm = float(np.mean(np.linalg.norm(
            (pred - pred[:, :, :1]) - (gt - gt[:, :, :1]), axis=-1)))
        entry = {
            "tag": tag,
            "relative_auc": round(float(score), 4),
            "auc": {k: round(float(v), 4) for k, v in metrics["auc"].items()},
            "mpjpe_mm": round(mpjpe_mm, 2),
            "root_err_mm": round(root_err_mm, 2),
            "mpjpe_root_aligned_mm": round(mpjpe_rel_mm, 2),
            "eval_windows": int(pred.shape[0]),
            "seconds": round(time.time() - t, 1),
        }
        print(json.dumps(entry), flush=True)
        return entry

    evals = [run_eval(state, "init")]
    losses_hist = []
    terms_hist = []  # per-term loss dicts — which term drives/regresses
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    it = 0
    # shuffle=True with no max_batches yields forever; bound it here
    batches = Prefetcher(train_reader.batches(args.batch, shuffle=True,
                                              max_batches=args.iters))
    for batch in batches:
        if it >= args.iters:
            break
        state, losses = step(state, batch, jax.random.fold_in(key, it))
        it += 1
        if it % 50 == 0:
            losses_hist.append(round(float(losses["loss"]), 2))
            terms_hist.append({k: round(float(v), 3)
                               for k, v in sorted(losses.items())})
        if it % args.eval_every == 0:
            evals.append(run_eval(state, f"it{it}"))
            print(f"it {it}: loss {losses_hist[-1]}", flush=True)
    report["train_seconds"] = round(time.time() - t0, 1)
    report["windows_per_sec_incl_host"] = round(
        args.iters * args.batch / report["train_seconds"], 1)
    report["loss_every_50"] = losses_hist
    report["loss_terms_every_50"] = terms_hist
    report["evals"] = evals

    # ---- bf16_eval accuracy gate: the TRAINED params evaluated through the
    # f32 eval path (above) and the bf16_eval path — the deltas are the
    # accuracy cost of mixed-precision inference at full sandbox scale
    # (ModelConfig.bf16_eval; perf A/B in scripts/ab_bf16_eval.py).
    import dataclasses

    cfg16 = cfg.replace(model=dataclasses.replace(
        cfg.model, bf16_eval=True, bf16_train=False))
    eval_step16 = make_eval_step(TEHNet(cfg=cfg16.model), hands, cfg16)
    final_bf16 = run_eval(state, "final_bf16_eval", step_fn=eval_step16)
    report["bf16_eval_gate"] = {
        "f32": {k: evals[-1][k] for k in
                ("relative_auc", "mpjpe_mm", "mpjpe_root_aligned_mm")},
        "bf16": {k: final_bf16[k] for k in
                 ("relative_auc", "mpjpe_mm", "mpjpe_root_aligned_mm")},
        "delta_mpjpe_mm": round(
            final_bf16["mpjpe_mm"] - evals[-1]["mpjpe_mm"], 3),
        "delta_relative_auc": round(
            final_bf16["relative_auc"] - evals[-1]["relative_auc"], 4),
    }
    print(json.dumps({"bf16_eval_gate": report["bf16_eval_gate"]}),
          flush=True)

    first, last = evals[0], evals[-1]
    report["learned"] = bool(last["relative_auc"] > first["relative_auc"])
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
