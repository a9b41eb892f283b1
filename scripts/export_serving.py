"""Export the trained inference pipeline as a serving artifact.

    python scripts/export_serving.py --checkpoint_path runs/.../ckpt \
        --out tehnet_b32.jaxexport --batch_size 32 [--platforms tpu,cpu]

The artifact is a single StableHLO module (weights baked in) callable from
any JAX process via ``ev2hands_tpu.export.load_serving`` — no model code,
flax, or checkpoint machinery needed at serving time. See
ev2hands_tpu/export.py for the design notes.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_path", default="",
                    help=".pth or orbax dir; empty = fresh init (smoke)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--max_events", type=int, default=8192)
    ap.add_argument("--platforms", default="tpu")
    ap.add_argument("--data_parallel", type=int, default=0,
                    help="export a multi-chip module: batch sharded over a"
                         " 'data' mesh axis of N devices")
    ap.add_argument("--event_parallel", type=int, default=0,
                    help="shard the event dimension over E devices too"
                         " (context-parallel serving; mesh is"
                         " (data_parallel or 1) x E)")
    ap.add_argument("--synthetic_mano", action="store_true")
    ap.add_argument("--host_platform", default="",
                    help="force the host backend for tracing (e.g. 'cpu' — "
                         "cross-platform lowering still targets --platforms;"
                         " this sandbox pins JAX_PLATFORMS, so the env var"
                         " route doesn't stick)")
    args = ap.parse_args()

    import jax

    if args.host_platform:
        jax.config.update("jax_platforms", args.host_platform)
    import optax

    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.export import export_serving
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.train import build_hands, create_train_state

    cfg = DEFAULT_CONFIG
    mesh = None
    if args.event_parallel:
        import numpy as np
        from jax.sharding import Mesh

        d = max(1, args.data_parallel)
        e = args.event_parallel
        mesh = Mesh(
            np.array(jax.devices()[: d * e]).reshape(d, e),
            ("data", "event"),
        )
        cfg = cfg.replace(model=cfg.model.__class__(
            **{**cfg.model.__dict__, "event_parallel": True}))
    hands_obj = build_hands(cfg, synthetic=args.synthetic_mano)
    hands = {s: h.params for s, h in hands_obj.items()}
    net = TEHNet(cfg=cfg.model, event_mesh=mesh)
    state = create_train_state(
        net, cfg, jax.random.PRNGKey(0), optax.adam(1e-3)
    )
    if args.checkpoint_path:
        from ev2hands_tpu.evaluate import load_checkpoint_into_state

        state = load_checkpoint_into_state(args.checkpoint_path, state, net)

    data = export_serving(
        net, hands, cfg,
        {"params": state.params, "batch_stats": state.batch_stats},
        batch_size=args.batch_size, max_events=args.max_events,
        platforms=args.platforms.split(","),
        data_parallel=args.data_parallel, mesh=mesh, path=args.out,
    )
    print(f"wrote {args.out}: {len(data) / 1e6:.1f} MB, "
          f"platforms={args.platforms}, batch={args.batch_size}, "
          f"data_parallel={args.data_parallel}, "
          f"event_parallel={args.event_parallel}")


if __name__ == "__main__":
    main()
