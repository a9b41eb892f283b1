"""Serving-artifact throughput: the exported StableHLO module vs the live
jitted pipeline, on whatever backend this process runs (the real TPU under
the sandbox's default platform).

The exported call is inlined into a jitted wrapper whose inputs are
perturbed per iteration by the scan key (polarity flip + coordinate jitter
— the documented hoist trap), timed with the on-device scan loop. The two
numbers should be ~equal: the artifact is the same program; a gap means
export lost something (e.g. Pallas gates off because the export happened on
a CPU host).

Run on the REAL TPU with an otherwise-idle host:
    python scripts/bench_serving.py [--batch 32]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max_events", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n_points", type=int, default=0,
                    help="override cfg.model.n_points (CPU smoke)")
    ap.add_argument("--host_platform", default="")
    ap.add_argument("--out", default="",
                    help="write the measurements to this JSON file")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.export import (
        export_serving,
        load_serving,
        make_serving_fn,
    )
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.train import build_hands, create_train_state
    from ev2hands_tpu.utils.profiling import device_throughput

    if args.host_platform:
        jax.config.update("jax_platforms", args.host_platform)
    cfg = DEFAULT_CONFIG
    if args.n_points:
        cfg = cfg.replace(model=cfg.model.__class__(
            **{**cfg.model.__dict__, "n_points": args.n_points}))
    platform = jax.default_backend()
    if platform not in ("cpu", "tpu", "cuda", "rocm"):
        # experimental plugin platforms (the axon tunnel) expose TPU devices
        # under a nonstandard backend name jax.export won't accept
        platform = ("tpu" if any(d.platform == "tpu" for d in jax.devices())
                    else "cpu")
    hands_obj = build_hands(cfg, synthetic=True)
    hands = {s: h.params for s, h in hands_obj.items()}
    net = TEHNet(cfg=cfg.model)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0),
                               optax.adam(1e-3))
    weights = {"params": state.params, "batch_stats": state.batch_stats}

    B, N = args.batch, args.max_events
    rng = np.random.RandomState(0)
    events0 = jnp.asarray(np.stack([
        rng.randint(0, cfg.sensor.width, (B, N)).astype(np.float32),
        rng.randint(0, cfg.sensor.height, (B, N)).astype(np.float32),
        np.sort(rng.rand(B, N).astype(np.float32) * 2.0, axis=-1),
        rng.randint(0, 2, (B, N)).astype(np.float32),
    ], axis=-1))
    valid = jnp.ones((B, N), bool)

    data = export_serving(net, hands, cfg, weights, batch_size=B,
                          max_events=N, platforms=(platform,))
    print(json.dumps({"artifact_mb": round(len(data) / 1e6, 1),
                      "platform": platform}), flush=True)
    served = load_serving(data)
    live = make_serving_fn(net, hands, cfg, weights=weights)

    def perturb(k):
        # flip polarities + jitter coordinates: nothing is loop-invariant
        flip = jax.random.bernoulli(k, 0.5, (B, N, 1)).astype(jnp.float32)
        dx = jax.random.randint(k, (B, N, 2), -1, 2).astype(jnp.float32)
        e = events0.at[..., 3:].set(jnp.abs(events0[..., 3:] - flip))
        return e.at[..., :2].add(dx)

    def timed(fn):
        def run(k):
            out = fn(perturb(k), valid, jax.random.key_data(k))
            return out["left_vertices"].sum() + out["class_logits"].sum()

        sec = device_throughput(lambda k: run(k), iters=args.iters)
        return args.batch / sec

    report = {"batch": B, "max_events": N, "platform": platform,
              "artifact_mb": round(len(data) / 1e6, 1)}
    for name, fn in (
        ("live_pipeline", lambda e, v, kd: live(
            e, v, jax.random.wrap_key_data(kd))),
        ("served_artifact", served),
    ):
        ws = timed(fn)
        report[name + "_windows_per_s"] = round(ws, 1)
        print(json.dumps({name + "_windows_per_s": round(ws, 1)}),
              flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
