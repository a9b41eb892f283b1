"""Serving LATENCY: ms per window across batch sizes B=1..16.

The use case is a real-time event-camera stream, so per-window latency —
not just throughput — is a first-class serving number. For each batch size
this times one full serving step (raw events -> device ERPC -> TEHNet ->
MANO vertices) as the mean steady-state step time of an on-device scan with
key-perturbed inputs (honest timing: the hoist trap and the double-warm
rule, see CLAUDE.md), for BOTH the live jitted pipeline and the exported
StableHLO artifact.

Reference counterpart: the per-forward wall-clock print in
``src/Ev2Hands/demo.py:24-33`` (host-timed, single CUDA forward).

Run on the REAL TPU with an otherwise-idle host:
    python scripts/serving_latency.py [--out artifacts/serving_latency.json]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8, 16])
    ap.add_argument("--max_events", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip_export", action="store_true",
                    help="time only the live pipeline (halves the compiles)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import wait_for_tpu
    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.export import export_serving, load_serving, make_serving_fn
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.train import build_hands, create_train_state
    from ev2hands_tpu.utils.profiling import device_throughput

    wait_for_tpu()
    cfg = DEFAULT_CONFIG
    platform = jax.default_backend()
    if platform not in ("cpu", "tpu", "cuda", "rocm"):
        platform = ("tpu" if any(d.platform == "tpu" for d in jax.devices())
                    else "cpu")
    hands_obj = build_hands(cfg, synthetic=True)
    hands = {s: h.params for s, h in hands_obj.items()}
    net = TEHNet(cfg=cfg.model)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0),
                               optax.adam(1e-3))
    weights = {"params": state.params, "batch_stats": state.batch_stats}
    live = make_serving_fn(net, hands, cfg, weights=weights)

    N = args.max_events
    rows = []
    for Bz in args.batches:
        rng = np.random.RandomState(Bz)
        events0 = jnp.asarray(np.stack([
            rng.randint(0, cfg.sensor.width, (Bz, N)).astype(np.float32),
            rng.randint(0, cfg.sensor.height, (Bz, N)).astype(np.float32),
            np.sort(rng.rand(Bz, N).astype(np.float32) * 2.0, axis=-1),
            rng.randint(0, 2, (Bz, N)).astype(np.float32),
        ], axis=-1))
        valid = jnp.ones((Bz, N), bool)

        def perturb(k):
            flip = jax.random.bernoulli(k, 0.5, (Bz, N, 1)).astype(jnp.float32)
            dx = jax.random.randint(k, (Bz, N, 2), -1, 2).astype(jnp.float32)
            e = events0.at[..., 3:].set(jnp.abs(events0[..., 3:] - flip))
            return e.at[..., :2].add(dx)

        def timed(fn):
            def run(k):
                out = fn(perturb(k), valid, k)
                return out["left_vertices"].sum() + out["class_logits"].sum()
            return device_throughput(run, iters=args.iters)

        sec = timed(lambda e, v, k: live(e, v, k))
        row = {"batch": Bz,
               "live_ms_per_batch": round(sec * 1e3, 3),
               "live_ms_per_window": round(sec * 1e3 / Bz, 3),
               "live_windows_per_s": round(Bz / sec, 1)}
        if not args.skip_export:
            data = export_serving(net, hands, cfg, weights, batch_size=Bz,
                                  max_events=N, platforms=(platform,))
            served = load_serving(data)
            sec_e = timed(lambda e, v, k: served(e, v, jax.random.key_data(k)))
            row.update(exported_ms_per_batch=round(sec_e * 1e3, 3),
                       exported_ms_per_window=round(sec_e * 1e3 / Bz, 3))
        rows.append(row)
        print(json.dumps(row), flush=True)

    report = {"platform": platform, "max_events": N, "iters": args.iters,
              "note": ("mean steady-state on-device step time per batch; "
                       "B=1 live_ms_per_batch is the per-window serving "
                       "latency"),
              "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
