"""Sustained HOST-INCLUSIVE training throughput: can the input pipeline feed
the device-step rate?

The device-only train step measures 118 w/s f32 at B=8 (bench.py, on-device
scan timing). This script measures the real loop — host loader -> (optional
Prefetcher thread) -> jitted train step — at steady state (post-compile,
``--iters`` iterations), for both loader backends:

  * python  — ``events.streams.Ev2HandSReader`` (per-sample numpy slicing,
              the reference's DataLoader-worker role, ``train.py:44-54``)
  * native  — ``events.native_loader.NativeEv2HandSLoader`` (C++ pthread-pool
              batch assembler over the decoded event table, csrc/)

Each backend is also measured loader-ONLY (no device work) to separate host
assembly cost from the device ceiling. Timing: the loop is async-dispatched;
the end time is taken after a ``jax.device_get`` of the final step's loss
(a device round-trip that drains the queue — ``block_until_ready`` does NOT
wait on this platform, see CLAUDE.md).

Run on the real TPU with an idle host:
    python scripts/host_throughput.py --iters 300
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def ensure_dataset(out: str, frames: int, cfg):
    """Generate + stitch a synthetic train split once; reuse across runs."""
    root = os.path.join(out, "train")
    if os.path.exists(root + ".h5"):
        return root
    from learn_artifact import make_sequence

    from ev2hands_tpu.datagen.generate import generate
    from ev2hands_tpu.datagen.stitch import stitch
    from ev2hands_tpu.mano import synthetic_mano_models

    models = synthetic_mano_models(0)
    rng = np.random.RandomState(0)
    n_seq = max(1, frames // 60)
    parts = generate(
        iter([make_sequence(rng, 60, phase=1.7 * j) for j in range(n_seq)]),
        models, os.path.join(out, "parts_train"), mode="train", cfg=cfg,
        frames_per_part=32, verbose=False,
    )
    return stitch(parts, root)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default="/tmp/host_tput")
    ap.add_argument("--loader_only_iters", type=int, default=200)
    args = ap.parse_args()

    import jax
    import optax

    from bench import wait_for_tpu
    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.events.native_loader import (
        NativeEv2HandSLoader,
        native_available,
    )
    from ev2hands_tpu.events.streams import Ev2HandSReader, Prefetcher
    from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.train import (
        build_collision_context,
        create_train_state,
        make_train_step,
    )

    wait_for_tpu()
    cfg = DEFAULT_CONFIG
    os.makedirs(args.out, exist_ok=True)
    root = ensure_dataset(args.out, args.frames, cfg)
    report = {"config": {"iters": args.iters, "batch": args.batch,
                         "n_points": cfg.model.n_points}}

    assert native_available(), "build csrc first: make -C csrc"

    def python_batches():
        return Ev2HandSReader(root, cfg.model.n_points).batches(
            args.batch, shuffle=True)

    def native_batches():
        return NativeEv2HandSLoader(root, cfg.model.n_points).batches(
            args.batch)

    # ---- loader-only rates (no device) ------------------------------------
    for name, mk in (("python", python_batches), ("native", native_batches)):
        it = mk()
        next(it)  # first-batch setup (file open / table decode)
        t0 = time.time()
        for _ in range(args.loader_only_iters):
            next(it)
        dt = time.time() - t0
        wps = args.loader_only_iters * args.batch / dt
        report[f"loader_only_{name}_wps"] = round(wps, 1)
        print(json.dumps({"phase": f"loader_only_{name}",
                          "windows_per_s": round(wps, 1)}), flush=True)

    # ---- full loop: loader (+prefetch) -> jitted train step ----------------
    models = synthetic_mano_models(0)
    hands_obj = create_mano_hands(models, cfg.mano.n_pose_comps)
    hands = {s: h.params for s, h in hands_obj.items()}
    ctx = build_collision_context(hands_obj)
    net = TEHNet(cfg=cfg.model)
    optimizer = optax.adam(1e-3)
    step = make_train_step(net, hands, ctx, cfg, optimizer, augment=True)
    key = jax.random.PRNGKey(1)

    variants = [
        ("python", python_batches, False),
        ("python_prefetch", python_batches, True),
        ("native", native_batches, False),
        ("native_prefetch", native_batches, True),
    ]
    for name, mk, prefetch in variants:
        state = create_train_state(net, cfg, jax.random.PRNGKey(0), optimizer)
        batches = mk()
        if prefetch:
            batches = Prefetcher(batches)
        it = iter(batches)
        losses = None
        for i in range(args.warmup):  # compile + steady-state spin-up
            state, losses = step(state, next(it), jax.random.fold_in(key, i))
        float(losses["loss"])  # drain the queue before starting the clock
        t0 = time.time()
        for i in range(args.iters):
            state, losses = step(state, next(it),
                                 jax.random.fold_in(key, 1000 + i))
        final = float(losses["loss"])  # device round-trip: drains the queue
        dt = time.time() - t0
        assert np.isfinite(final)
        wps = args.iters * args.batch / dt
        report[f"train_{name}_wps"] = round(wps, 1)
        print(json.dumps({"phase": f"train_{name}", "iters": args.iters,
                          "windows_per_s": round(wps, 1),
                          "ms_per_iter": round(dt / args.iters * 1e3, 2)}),
              flush=True)

    print(json.dumps({"summary": report}))
    with open(os.path.join(args.out, "host_throughput.json"), "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
