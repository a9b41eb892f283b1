"""Capture a jax.profiler trace of the inference pipeline on the real chip.

Produces the BENCH companion artifact: a TensorBoard-loadable profile of the
full jitted pipeline (device ERPC transform -> TEHNet forward -> both MANO
hands). Run on the TPU:

    python scripts/capture_trace.py --out artifacts/trace_inference

Inspect with: tensorboard --logdir artifacts/trace_inference
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/trace_inference")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--n_points", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
    from ev2hands_tpu.model import TEHNet, apply_mano

    cfg = DEFAULT_CONFIG.replace(
        model=DEFAULT_CONFIG.model.__class__(
            n_points=args.n_points, fps_deterministic=True
        )
    )
    net = TEHNet(cfg=cfg.model)
    hands = {s: h.params for s, h in
             create_mano_hands(synthetic_mano_models(0)).items()}
    variables = jax.jit(
        lambda k: net.init({"params": k},
                           jnp.zeros((1, 8, cfg.model.in_channels)), train=False)
    )(jax.random.PRNGKey(0))

    @jax.jit
    def pipeline(variables, raw_events, raw_labels, key):
        erpc = erpc_batch_transform(
            raw_events, raw_labels, key,
            width=cfg.sensor.width, height=cfg.sensor.height,
            n_out=args.n_points,
        )
        outputs = net.apply(variables, erpc.events, train=False)
        outputs = apply_mano(hands, outputs)
        return (outputs["class_logits"], outputs["left"]["vertices"],
                outputs["right"]["vertices"])

    rng = np.random.RandomState(0)
    B, N = args.batch_size, args.n_points
    t = np.sort(rng.randint(0, int(5e6), (B, N))).astype(np.float32)
    raw = jnp.asarray(np.stack([
        rng.randint(0, cfg.sensor.width, (B, N)).astype(np.float32),
        rng.randint(0, cfg.sensor.height, (B, N)).astype(np.float32),
        t,
        rng.randint(0, 2, (B, N)).astype(np.float32),
    ], axis=-1))
    labels = jnp.asarray(rng.randint(0, 4, (B, N)).astype(np.int32))

    # compile outside the trace so the artifact shows steady-state execution
    jax.device_get(pipeline(variables, raw, labels, jax.random.PRNGKey(1)))

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for i in range(args.reps):
            jax.device_get(
                pipeline(variables, raw, labels, jax.random.PRNGKey(2 + i))
            )

    total = 0
    for root, _, files in os.walk(args.out):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    print(f"trace written to {args.out} ({total / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
