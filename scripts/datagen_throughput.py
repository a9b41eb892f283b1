"""Post-compile datagen throughput: frames/s and events/s of the device
rasterizer + ESIM pipeline, plus the host-inclusive sequence loop.

BASELINE.json config 5 names event-generation offload as a first-class
configuration (the reference burns 8 GPUs x 48 h of SLURM on it,
``src/HandSimulator/slurm_main.sh``); until now the only number here was a
compile-inclusive e2e smoke. This measures steady state:

  * device_frame_fn — the jitted MANO -> Gouraud rasterize -> Bayer-log ->
    ESIM program alone, timed with an on-device scan that threads the ESIM
    state across frames and key-perturbs the hand pose per frame (honest:
    nothing is loop-invariant; the ESIM state dependence chains frames
    anyway), at the production DAVIS346 sensor size;
  * host_inclusive — simulate_sequence()'s full loop (device program + host
    compact-event expand + label lookup + PCA conversion), second sequence
    timed so compiles are excluded.

Run on the REAL TPU with an otherwise-idle host:
    python scripts/datagen_throughput.py [--out artifacts/datagen_throughput.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

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
    ap.add_argument("--device_iters", type=int, default=100)
    ap.add_argument("--host_frames", type=int, default=120)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import wait_for_tpu
    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.datagen.generate import (
        make_frame_simulator,
        scene_topology,
        simulate_sequence,
    )
    from ev2hands_tpu.datagen.meshes import random_skin_vertex_colors
    from ev2hands_tpu.datagen.rasterizer import random_background
    from ev2hands_tpu.mano import synthetic_mano_models
    from ev2hands_tpu.mano.layer import create_mano_params
    from ev2hands_tpu.ops.esim import esim_init

    wait_for_tpu()
    cfg = DEFAULT_CONFIG
    W, H = cfg.sensor.width, cfg.sensor.height
    models = synthetic_mano_models(0)
    n_comps = cfg.mano.n_pose_comps
    params = {s: create_mano_params(models[s], n_comps)
              for s in ("left", "right")}
    faces = np.asarray(models["left"].faces, np.int32)
    rng = np.random.RandomState(0)
    _, _, n_total, _ = scene_topology(faces, cfg)
    vcolors = random_skin_vertex_colors(n_total, rng)
    background = random_background(jax.random.PRNGKey(1), H, W,
                                   cfg.datagen.background_cells)
    frame_fn = make_frame_simulator(params, faces, cfg, vcolors)

    # ---- device program alone: scan threads the ESIM state ---------------
    dt_ns = 1e9 / cfg.esim.simulator_fps
    base = {s: {"global_orient": jnp.zeros(3),
                "hand_pose": jnp.zeros(n_comps),
                "betas": jnp.zeros(10),
                "transl": jnp.asarray([x0, 0.0, -0.45])}
            for s, x0 in (("left", -0.08), ("right", 0.08))}

    def looped(state0, key):
        def body(c, kk):
            state, fi = c
            fp = {
                s: {
                    "global_orient": 0.3 * jax.random.normal(
                        jax.random.fold_in(kk, i), (3,)),
                    "hand_pose": 0.5 * jax.random.normal(
                        jax.random.fold_in(kk, i + 2), (n_comps,)),
                    "betas": base[s]["betas"],
                    "transl": base[s]["transl"] + 0.02 * jax.random.normal(
                        jax.random.fold_in(kk, i + 4), (3,)),
                }
                for i, s in enumerate(("left", "right"))
            }
            state2, compact, _ = frame_fn(
                state, fp, fi * jnp.float32(dt_ns), kk, background)
            return (state2, fi + 1.0), compact.count.sum()
        (_, _), counts = jax.lax.scan(
            body, (state0, jnp.float32(0.0)),
            jax.random.split(key, args.device_iters))
        return counts.sum()

    fn = jax.jit(looped)
    state0 = esim_init(H, W)
    n_ev = int(jax.device_get(fn(state0, jax.random.PRNGKey(2))))
    jax.device_get(fn(state0, jax.random.PRNGKey(3)))
    t0 = time.perf_counter()
    n_ev = int(jax.device_get(fn(state0, jax.random.PRNGKey(4))))
    dt = time.perf_counter() - t0
    device = {
        "frames_per_s": round(args.device_iters / dt, 1),
        "ms_per_frame": round(dt / args.device_iters * 1e3, 3),
        "events_per_s": round(n_ev / dt),
        "events_per_frame": round(n_ev / args.device_iters, 1),
        "sensor": f"{W}x{H}",
        "iters": args.device_iters,
    }
    print(json.dumps({"device_frame_fn": device}), flush=True)

    # ---- host-inclusive sequence loop (2nd run, compiles cached) ---------
    hands_data = dict(models)
    seq = make_sequence(np.random.RandomState(1), args.host_frames)
    for frame in simulate_sequence(seq[:8], hands_data, cfg, seed=0):
        pass  # warm: compile frame_fn + PCA machinery
    t0 = time.perf_counter()
    tot_ev = 0
    n_frames = 0
    for frame in simulate_sequence(seq, hands_data, cfg, seed=1):
        tot_ev += len(frame["events"])
        n_frames += 1
    dt = time.perf_counter() - t0
    host = {
        "frames_per_s": round(n_frames / dt, 1),
        "events_per_s": round(tot_ev / dt),
        "frames": n_frames,
        "events": tot_ev,
        "seconds": round(dt, 1),
    }
    print(json.dumps({"host_inclusive": host}), flush=True)

    report = {"device_frame_fn": device, "host_inclusive": host,
              "note": ("steady-state (post-compile); device scan threads "
                       "ESIM state across frames with key-perturbed poses. "
                       "Reference scale: 8xGPU x 48h SLURM "
                       "(src/HandSimulator/slurm_main.sh)")}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
