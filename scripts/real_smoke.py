"""Drive finetune.py and evaluate_real.py on REAL hardware (TPU).

Rounds <=4 exercised datagen->train->eval->demo on the chip
(scripts/e2e_smoke.py) but the real-data entry points only ran under the
CPU test suite. This smoke:

  1. runs the actual ``finetune()`` entry point (real-mode loss: no MANO GT,
     root-relative j3d + 2-D reprojection + inter-hand consistency) on a
     synthetic Ev2Hands-R recording for --iters steps, with the held-out-val
     eval/save-on-best branch exercised;
  2. measures the HONEST finetune step rate (on-device lax.scan over the
     jitted step with key-perturbed events — the published train-step
     methodology, see bench.measure_train_step) — the reference never
     reports one (``src/Ev2Hands/finetune.py:25-155``);
  3. runs ``evaluate_recording`` (the Evaluator-R: sliding 2 ms windows,
     PCK/AUC 0-100 mm, MPJPE, root distance, non-collision % via the TPU
     SAT kernel) over a held-out synthetic recording, end to end on the
     chip (``src/Ev2Hands/evaluate_ev2hands_r.py:163-270``).

Run on the REAL TPU with an otherwise-idle host (~15 min):
    python scripts/real_smoke.py [--out artifacts/real_smoke.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--rate_iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/real_smoke")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from bench import wait_for_tpu
    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.events.real_streams import (
        Ev2HandRReader,
        RealStream,
        write_synthetic_ev2hands_r,
    )
    from ev2hands_tpu.evaluate_real import (
        evaluate_recording,
        make_real_eval_step,
    )
    from ev2hands_tpu.finetune import finetune, make_finetune_step
    from ev2hands_tpu.train import (
        build_collision_context,
        build_hands,
        create_train_state,
    )
    from ev2hands_tpu.model import TEHNet

    wait_for_tpu()
    cfg = DEFAULT_CONFIG.replace(
        train=DEFAULT_CONFIG.train.__class__(batch_size=args.batch,
                                             eval_batch_size=32))
    os.makedirs(os.path.join(args.workdir, "train"), exist_ok=True)
    os.makedirs(os.path.join(args.workdir, "val"), exist_ok=True)
    write_synthetic_ev2hands_r(
        os.path.join(args.workdir, "train", "subject0.pickle"),
        n_events=300_000, n_frames=60, seed=0)
    val_rec = write_synthetic_ev2hands_r(
        os.path.join(args.workdir, "val", "subject1.pickle"),
        n_events=200_000, n_frames=40, seed=1)
    report = {"iters": args.iters, "batch": args.batch}

    # ---- 1. the finetune() entry point, end to end ------------------------
    t0 = time.time()
    state = finetune(
        cfg, data_root=os.path.join(args.workdir, "train"),
        max_iter=args.iters, save_iter=max(1, args.iters // 2),
        synthetic_mano=True,
        val_data_root=os.path.join(args.workdir, "val"),
        max_eval_iters=64,
    )
    report["finetune_entrypoint"] = {
        "iters": args.iters,
        "seconds_incl_compile": round(time.time() - t0, 1),
    }
    print(json.dumps({"finetune_entrypoint": report["finetune_entrypoint"]}),
          flush=True)

    # ---- 2. honest finetune step rate (post-compile, hoist-proofed) -------
    hands_obj = build_hands(cfg, synthetic=True)
    hands = {s: h.params for s, h in hands_obj.items()}
    ctx = build_collision_context(hands_obj)
    net = TEHNet(cfg=cfg.model)
    optimizer = optax.adam(cfg.train.learning_rate)
    fstate = create_train_state(net, cfg, jax.random.PRNGKey(0), optimizer)
    projection = cfg.camera.projection_matrix(cfg.sensor.width,
                                              cfg.sensor.height)
    step = make_finetune_step(net, hands, ctx, cfg, optimizer, projection)
    reader = Ev2HandRReader(os.path.join(args.workdir, "train"), seed=3)
    batch = next(reader.batches(args.batch, max_batches=1))
    batch = jax.tree.map(jnp.asarray, batch)

    def looped(state, key):
        def body(s, k):
            flip = jax.random.bernoulli(k, 0.5, (args.batch, 1))
            p = batch["events"][:, :, 3]
            b = dict(batch, events=batch["events"].at[:, :, 3].set(
                jnp.where(flip, 1.0 - p, p)))
            s2, losses = step(s, b, k)
            return s2, losses["loss"]
        _, losses = jax.lax.scan(body, state,
                                 jax.random.split(key, args.rate_iters))
        return losses[-1]

    fn = jax.jit(looped)
    jax.device_get(fn(fstate, jax.random.PRNGKey(1)))
    jax.device_get(fn(fstate, jax.random.PRNGKey(3)))
    t0 = time.perf_counter()
    jax.device_get(fn(fstate, jax.random.PRNGKey(2)))
    dt = time.perf_counter() - t0
    report["finetune_step"] = {
        "windows_per_s": round(args.batch * args.rate_iters / dt, 1),
        "ms_per_step": round(dt / args.rate_iters * 1e3, 1),
    }
    print(json.dumps({"finetune_step": report["finetune_step"]}), flush=True)

    # ---- 3. Evaluator-R over the held-out recording -----------------------
    eval_step = make_real_eval_step(net, hands, ctx, cfg)
    stream = RealStream(val_rec, cfg.sensor.width, cfg.sensor.height)
    t0 = time.time()
    res = evaluate_recording(eval_step, state, stream, cfg,
                             batch_size=32)
    dt = time.time() - t0
    report["evaluate_real"] = {
        "frames": int(res["frames"]),
        "mpjpe_mm": round(float(res["mpjpe_mm"]), 2),
        "non_collision_pct": round(float(res["non_collision_pct"]), 2),
        "auc": {k: round(float(v), 4) for k, v in res["auc"].items()},
        "seconds_incl_compile": round(dt, 1),
        "windows_per_s_incl_compile": round(res["frames"] / dt, 1),
    }
    print(json.dumps({"evaluate_real": report["evaluate_real"]}), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
