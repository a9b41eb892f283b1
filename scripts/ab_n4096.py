"""A/B: sparse Pallas grouping vs XLA dense at N=4096 (and N=2048).

Round-2's production sparse kernel silently capped at N=2048 (morton_perm's
packed key); the cap is gone — this measures the honest full-pipeline
windows/s with `pallas_grouping` on vs off at both window sizes on the real
chip, with bench.py's hoist-proof key-perturbed on-device timing.

Usage: python scripts/ab_n4096.py [--batch 16] [--iters 10]
       python scripts/ab_n4096.py --nb 128 256 512   # point-tile-size sweep
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def measure(n_points, batch_size, iters, pallas, nb=256):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
    from ev2hands_tpu.model import TEHNet, apply_mano

    cfg = DEFAULT_CONFIG.replace(
        model=DEFAULT_CONFIG.model.__class__(
            n_points=n_points, fps_deterministic=True,
            pallas_grouping=pallas, pallas_nb=nb,
        )
    )
    net = TEHNet(cfg=cfg.model)
    hands = {s: h.params for s, h in
             create_mano_hands(synthetic_mano_models(0)).items()}
    variables = jax.jit(lambda k: net.init(
        {"params": k}, jnp.zeros((1, n_points, cfg.model.in_channels)),
        train=False))(jax.random.PRNGKey(0))

    def pipeline(raw_events, raw_labels, key):
        erpc = erpc_batch_transform(
            raw_events, raw_labels, key,
            width=cfg.sensor.width, height=cfg.sensor.height, n_out=n_points,
        )
        outputs = net.apply(variables, erpc.events, train=False)
        outputs = apply_mano(hands, outputs)
        return outputs["left"]["vertices"]

    def looped(raw_events, raw_labels, key):
        def body(c, k):
            flip = jax.random.bernoulli(k, 0.5, (raw_events.shape[0], 1))
            p = raw_events[:, :, 3]
            ev = raw_events.at[:, :, 3].set(jnp.where(flip, 1.0 - p, p))
            return c + pipeline(ev, raw_labels, k).sum(), None

        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, iters))
        return acc

    fn = jax.jit(looped)
    rng = np.random.RandomState(0)
    t = np.sort(rng.randint(0, int(5e6), (batch_size, n_points))).astype(np.float32)
    raw = np.stack([
        rng.randint(0, cfg.sensor.width, (batch_size, n_points)).astype(np.float32),
        rng.randint(0, cfg.sensor.height, (batch_size, n_points)).astype(np.float32),
        t,
        rng.randint(0, 2, (batch_size, n_points)).astype(np.float32),
    ], axis=-1)
    labels = rng.randint(0, 4, (batch_size, n_points)).astype(np.int32)
    raw, labels = jnp.asarray(raw), jnp.asarray(labels)

    jax.device_get(fn(raw, labels, jax.random.PRNGKey(1)))
    jax.device_get(fn(raw, labels, jax.random.PRNGKey(3)))
    t0 = time.perf_counter()
    jax.device_get(fn(raw, labels, jax.random.PRNGKey(2)))
    dt = time.perf_counter() - t0
    return batch_size * iters / dt, dt / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n_points", type=int, nargs="*", default=[2048, 4096])
    ap.add_argument("--nb", type=int, nargs="*", default=None,
                    help="sweep the sparse kernel's point-tile size instead "
                         "of the on/off A/B")
    args = ap.parse_args()

    for n in args.n_points:
        if args.nb:
            variants = [(True, nb) for nb in args.nb]
        else:
            variants = [(True, 256), (False, 256)]
        for pallas, nb in variants:
            wps, ms = measure(n, args.batch, args.iters, pallas, nb=nb)
            print(json.dumps({
                "n_points": n, "pallas_grouping": pallas, "nb": nb,
                "batch": args.batch,
                "windows_per_sec": round(wps, 1),
                "ms_per_batch": round(ms, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
