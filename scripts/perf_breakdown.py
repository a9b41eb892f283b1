"""Component-level timing of the inference pipeline and train step on the
current backend (TPU by default).

Prints one JSON line per measurement: ERPC transform alone, network forward
alone, MANO alone, full pipeline at several batch sizes, and the train step.
Uses the on-device scan timing from utils.profiling (host-looped timing is
meaningless over the high-latency device tunnel — see CLAUDE.md).

Usage: python scripts/perf_breakdown.py [--batch 32] [--train]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 64, 128])
    ap.add_argument("--train", action="store_true", help="also time the train step")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
    from ev2hands_tpu.model import TEHNet, apply_mano
    from ev2hands_tpu.utils.profiling import device_throughput

    n_points = 2048
    cfg = DEFAULT_CONFIG.replace(
        model=DEFAULT_CONFIG.model.__class__(n_points=n_points, fps_deterministic=True)
    )
    net = TEHNet(cfg=cfg.model)
    hands = {s: h.params for s, h in create_mano_hands(synthetic_mano_models(0)).items()}
    variables = jax.jit(
        lambda k: net.init({"params": k}, jnp.zeros((1, n_points, cfg.model.in_channels)),
                           train=False)
    )(jax.random.PRNGKey(0))

    def make_raw(batch):
        rng = np.random.RandomState(0)
        t = np.sort(rng.randint(0, int(5e6), (batch, n_points))).astype(np.float32)
        raw = np.stack([
            rng.randint(0, cfg.sensor.width, (batch, n_points)).astype(np.float32),
            rng.randint(0, cfg.sensor.height, (batch, n_points)).astype(np.float32),
            t,
            rng.randint(0, 2, (batch, n_points)).astype(np.float32),
        ], axis=-1)
        labels = rng.randint(0, 4, (batch, n_points)).astype(np.int32)
        return jnp.asarray(raw), jnp.asarray(labels)

    def report(name, batch, sec):
        print(json.dumps({
            "component": name, "batch": batch,
            "ms_per_batch": round(sec * 1e3, 3),
            "windows_per_sec": round(batch / sec, 2),
        }), flush=True)

    B0 = args.batches[0]
    raw, labels = make_raw(B0)

    # Every closure below perturbs its inputs with the per-iteration scan key:
    # XLA hoists loop-invariant work out of the timing scan, so a constant
    # input reads a fake ~5 ms floor (the '+ 0.0 * k' trick does NOT defeat
    # the hoist — the computation itself must depend on k). See CLAUDE.md.
    def flip_polarity(ev, k):
        """bench.py's trick: a key-dependent polarity flip keeps the pixel
        geometry valid while making every rasterization operand live."""
        flip = jax.random.bernoulli(k, 0.5, (ev.shape[0], 1))
        p = ev[:, :, 3]
        return ev.at[:, :, 3].set(jnp.where(flip, 1.0 - p, p))

    sec = device_throughput(
        lambda k: erpc_batch_transform(
            flip_polarity(raw, k), labels, k,
            width=cfg.sensor.width, height=cfg.sensor.height,
            n_out=n_points).events,
        iters=args.iters,
    )
    report("erpc_transform", B0, sec)

    erpc_events = erpc_batch_transform(
        raw, labels, jax.random.PRNGKey(0),
        width=cfg.sensor.width, height=cfg.sensor.height, n_out=n_points,
    ).events

    def fwd(k):
        # tiny key-dependent jitter (<< any feature scale) so the whole
        # forward is live per iteration; the perturbation op itself is noise
        # at this size (~40 us of elementwise work vs a ~20 ms forward)
        e = erpc_events + 1e-6 * jax.random.normal(k, erpc_events.shape)
        return net.apply(variables, e, train=False)["class_logits"]

    sec = device_throughput(fwd, iters=args.iters)
    report("network_forward", B0, sec)

    fixed = net.apply(variables, erpc_events, train=False)

    def mano_only(k):
        live = jax.tree.map(
            lambda x: x + 1e-6 * jax.random.normal(k, x.shape, x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            fixed,
        )
        return apply_mano(hands, live)["left"]["vertices"]

    sec = device_throughput(mano_only, iters=args.iters)
    report("apply_mano", B0, sec)

    for batch in args.batches:
        raw_b, labels_b = make_raw(batch)

        def pipeline(k):
            erpc = erpc_batch_transform(
                flip_polarity(raw_b, k), labels_b, k, width=cfg.sensor.width,
                height=cfg.sensor.height, n_out=n_points)
            out = net.apply(variables, erpc.events, train=False)
            out = apply_mano(hands, out)
            return out["left"]["vertices"]

        sec = device_throughput(pipeline, iters=args.iters)
        report("full_pipeline", batch, sec)

    if args.train:
        import optax

        from __graft_entry__ import _fake_batch
        from ev2hands_tpu.train import (
            build_collision_context, create_train_state, make_train_step,
        )

        bs = 8
        tcfg = cfg.replace(train=cfg.train.__class__(batch_size=bs))
        hands_obj = create_mano_hands(synthetic_mano_models(0))
        ctx = build_collision_context(hands_obj)
        optimizer = optax.adam(tcfg.train.learning_rate)
        state = create_train_state(net, tcfg, jax.random.PRNGKey(0), optimizer)
        step = make_train_step(
            net, {s: h.params for s, h in hands_obj.items()}, ctx, tcfg, optimizer)
        batch = {k: jnp.asarray(v) if not isinstance(v, dict)
                 else {kk: jnp.asarray(vv) for kk, vv in v.items()}
                 for k, v in _fake_batch(tcfg, bs, np.random.RandomState(0)).items()}

        def looped(state, key):
            def body(s, k):
                s2, losses = step(s, batch, k)
                return s2, losses["loss"]
            _, losses = jax.lax.scan(body, state, jax.random.split(key, args.iters))
            return losses[-1]

        fn = jax.jit(looped)
        jax.device_get(fn(state, jax.random.PRNGKey(1)))
        jax.device_get(fn(state, jax.random.PRNGKey(3)))
        t0 = time.perf_counter()
        jax.device_get(fn(state, jax.random.PRNGKey(2)))
        sec = (time.perf_counter() - t0) / args.iters
        report("train_step", bs, sec)


if __name__ == "__main__":
    main()
