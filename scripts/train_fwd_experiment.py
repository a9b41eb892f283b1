"""Decision experiment for the BN-parity dense TRAINING forward.

The train step runs the gather grouping path solely for BatchNorm-stat
parity (model/layers.py), costing ~44 ms of the ~73 ms step at B=8 while
the dense eval path does the same math in far less. Before building the
weighted-BN dense training mode (multiplicity-weighted stats reproducing the
gather multiset), measure whether the dense formulation's fwd+bwd is
actually faster at training shapes:

  * gather_fwd        — training forward, gather grouping (production train)
  * gather_step       — full value_and_grad + Adam (production train step)
  * dense_fwd         — dense-grouping forward at the same shapes (eval BN
                        stats; same conv/mask structure as the planned
                        BN-parity mode minus its two stats sweeps)
  * dense_step        — value_and_grad + Adam through the dense forward
  * group_only        — the gather path's top_k + index_points for all sa1
                        scales alone (isolates the gather cost)

All timings are hoist-proof (inputs key-perturbed inside the scan).
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n_points", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--modes", nargs="*",
                    default=["gather", "dense", "dense_train"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import __graft_entry__ as ge
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.losses import mano_losses, total_loss
    from ev2hands_tpu.model import TEHNet, apply_mano
    from ev2hands_tpu.train import (
        build_collision_context, create_train_state, make_train_step,
    )
    from ev2hands_tpu.utils.profiling import device_throughput

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    N = args.n_points
    S1 = max(8, N // 4)
    B = args.batch
    cfg = ge._small_cfg(n_points=N, batch=B)
    hands_obj = __import__("ev2hands_tpu.mano", fromlist=["x"]).create_mano_hands(
        __import__("ev2hands_tpu.mano", fromlist=["x"]).synthetic_mano_models(0)
    )
    hands = {s: h.params for s, h in hands_obj.items()}
    ctx = build_collision_context(hands_obj)
    optimizer = optax.adam(1e-3)

    batch = {k: jnp.asarray(v) if not isinstance(v, dict)
             else {kk: jnp.asarray(vv) for kk, vv in v.items()}
             for k, v in ge._fake_batch(cfg, B, np.random.RandomState(0)).items()}

    def perturb(k):
        flip = jax.random.bernoulli(k, 0.5, (B, 1))
        p = batch["events"][:, :, 3]
        return dict(batch, events=batch["events"].at[:, :, 3].set(
            jnp.where(flip, 1.0 - p, p)))

    def report(name, sec):
        print(json.dumps({"component": name, "batch": B,
                          "ms": round(sec * 1e3, 2),
                          "windows_per_sec": round(B / sec, 1)}), flush=True)

    results = {}
    for mode in args.modes:
        mcfg = cfg.replace(model=cfg.model.__class__(
            n_points=N, fps_deterministic=True,
            grouping="dense" if mode != "gather" else "gather",
            dense_train=(mode == "dense_train"),
            pallas_grouping=False))
        net = TEHNet(cfg=mcfg.model)
        state = create_train_state(net, mcfg, jax.random.PRNGKey(0), optimizer)

        # NOTE dense mode: layers.py routes use_dense only when not train, so
        # pass train=False to the network but keep the full loss+grad — the
        # point is the conv/mask compute shape under autodiff, not BN
        # semantics (the real BN-parity mode adds ~30% fwd for stats sweeps).
        train_flag = mode in ("gather", "dense_train")

        def fwd_loss(params, b, k):
            erpc = erpc_batch_transform(
                b["events"], b["labels"], k,
                width=cfg.sensor.width, height=cfg.sensor.height,
                n_out=N, augment=False)
            kwargs = {}
            if train_flag:
                kwargs = dict(rngs={"dropout": k, "fps": k},
                              mutable=["batch_stats"])
                outputs, _ = net.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    erpc.events, train=True, **kwargs)
            else:
                outputs = net.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    erpc.events, train=False)
            outputs = apply_mano(hands, outputs)
            targets = {"left": b["left"], "right": b["right"],
                       "handedness": b["handedness"],
                       "class_logits": erpc.labels}
            return total_loss(mano_losses(
                outputs, targets, hands, ctx, cfg.loss))

        try:
            sec = device_throughput(
                lambda k: fwd_loss(state.params, perturb(k), k),
                iters=args.iters)
            report(f"{mode}_fwd", sec)
            results[f"{mode}_fwd_ms"] = sec * 1e3
        except Exception as e:
            print(json.dumps({"component": f"{mode}_fwd",
                              "error": str(e)[:200]}), flush=True)

        def step(k):
            loss, grads = jax.value_and_grad(fwd_loss)(
                state.params, perturb(k), k)
            upd, _ = optimizer.update(grads, state.opt_state, state.params)
            p2 = optax.apply_updates(state.params, upd)
            return loss + jax.tree.reduce(
                lambda a, x: a + x.sum(), p2, 0.0) * 0.0

        try:
            sec = device_throughput(step, iters=args.iters)
            report(f"{mode}_step", sec)
            results[f"{mode}_step_ms"] = sec * 1e3
        except Exception as e:
            print(json.dumps({"component": f"{mode}_step",
                              "error": str(e)[:200]}), flush=True)

    # isolate the gather machinery: FPS + 3x (ball query + neighbor gathers)
    from ev2hands_tpu.ops.pallas_ops import fps_auto
    from ev2hands_tpu.ops.pointnet import (
        index_points, query_ball_point, square_distance,
    )

    ev0 = erpc_batch_transform(
        batch["events"], batch["labels"], jax.random.PRNGKey(0),
        width=cfg.sensor.width, height=cfg.sensor.height, n_out=N,
        augment=False).events

    def group_only(k):
        e = ev0 + 1e-6 * jax.random.normal(k, ev0.shape)
        xyz = e[..., :3]
        fi = fps_auto(xyz, S1, key=None)
        nx = index_points(xyz, fi)
        sq = square_distance(nx, xyz)
        acc = 0.0
        for r, K in ((0.1, 32), (0.2, 64), (0.4, 128)):
            idx = query_ball_point(r, K, xyz, nx, sqrdists=sq)
            g = jnp.concatenate(
                [index_points(e, idx),
                 index_points(xyz, idx) - nx[:, :, None, :]], -1)
            acc = acc + g.sum()
        return acc

    sec = device_throughput(group_only, iters=args.iters)
    report("sa1_group_only(topk+gathers)", sec)
    print(json.dumps({"summary": {k: round(v, 2) for k, v in results.items()}}))


def fine_breakdown(batch=8, iters=20, n_points=2048):
    """Split the gather-path grouping machinery into fps / sqrdists / topk /
    gathers, per encoder layer, to target the right op."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.ops.pallas_ops import fps_auto
    from ev2hands_tpu.ops.pointnet import (
        index_points, query_ball_point, square_distance,
    )
    from ev2hands_tpu.utils.profiling import device_throughput

    cfg = ge._small_cfg(n_points=n_points, batch=batch)
    batch_d = ge._fake_batch(cfg, batch, np.random.RandomState(0))
    ev0 = erpc_batch_transform(
        jnp.asarray(batch_d["events"]), jnp.asarray(batch_d["labels"]),
        jax.random.PRNGKey(0), width=cfg.sensor.width,
        height=cfg.sensor.height, n_out=n_points, augment=False).events

    def jitter(k):
        return ev0 + 1e-6 * jax.random.normal(k, ev0.shape)

    import json as _json

    def rep(name, sec):
        print(_json.dumps({"component": name,
                           "ms": round(sec * 1e3, 2)}), flush=True)

    # sa1 pieces (S=512, N=2048)
    def fps_only(k):
        e = jitter(k)
        return fps_auto(e[..., :3], 512, key=None).sum()

    rep("sa1_fps", device_throughput(fps_only, iters=iters))

    def sq_only(k):
        e = jitter(k)
        xyz = e[..., :3]
        fi = fps_auto(xyz, 512, key=None)
        nx = index_points(xyz, fi)
        return square_distance(nx, xyz).sum()

    rep("sa1_fps+sqrdists", device_throughput(sq_only, iters=iters))

    def topk_only(k):
        e = jitter(k)
        xyz = e[..., :3]
        fi = fps_auto(xyz, 512, key=None)
        nx = index_points(xyz, fi)
        sq = square_distance(nx, xyz)
        acc = 0
        for r, K in ((0.1, 32), (0.2, 64), (0.4, 128)):
            acc = acc + query_ball_point(r, K, xyz, nx, sqrdists=sq).sum()
        return acc

    rep("sa1_fps+sq+topk", device_throughput(topk_only, iters=iters))

    # sa2-shaped group machinery: S=128, N=512, C=323
    feats512 = jax.random.normal(jax.random.PRNGKey(9), (batch, 512, 320))

    def sa2_group(k):
        e = jitter(k)
        xyz = index_points(e[..., :3], fps_auto(e[..., :3], 512, key=None))
        f = feats512 + 0.0 * xyz.sum()
        fi = fps_auto(xyz, 128, key=None)
        nx = index_points(xyz, fi)
        sq = square_distance(nx, xyz)
        acc = 0.0
        for r, K in ((0.4, 64), (0.8, 128)):
            idx = query_ball_point(r, K, xyz, nx, sqrdists=sq)
            g = jnp.concatenate(
                [index_points(f, idx),
                 index_points(xyz, idx) - nx[:, :, None, :]], -1)
            acc = acc + g.sum()
        return acc

    rep("sa2_group(topk+gathers C=323)", device_throughput(sa2_group, iters=iters))





def fused_group_probe(batch=8, iters=20, n_points=2048):
    """Probe whether per-call overhead dominates the sa1 group machinery:
    (a) one top_k(k=128) over stacked [B, 3S, N] scores vs three calls;
    (b) one index_points on concatenated [B, S, 224] indices vs six."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.ops.pallas_ops import fps_auto
    from ev2hands_tpu.ops.pointnet import (
        index_points, query_ball_point, square_distance,
    )
    from ev2hands_tpu.utils.profiling import device_throughput

    cfg = ge._small_cfg(n_points=n_points, batch=batch)
    bd = ge._fake_batch(cfg, batch, np.random.RandomState(0))
    ev0 = erpc_batch_transform(
        jnp.asarray(bd["events"]), jnp.asarray(bd["labels"]),
        jax.random.PRNGKey(0), width=cfg.sensor.width,
        height=cfg.sensor.height, n_out=n_points, augment=False).events
    N = n_points
    SCALES = ((0.1, 32), (0.2, 64), (0.4, 128))

    def rep(name, sec):
        print(_json.dumps({"component": name,
                           "ms": round(sec * 1e3, 2)}), flush=True)

    def base(k):
        e = ev0 + 1e-6 * jax.random.normal(k, ev0.shape)
        xyz = e[..., :3]
        nx = index_points(xyz, fps_auto(xyz, 512, key=None))
        return e, xyz, nx, square_distance(nx, xyz)

    def topk_fused(k):
        e, xyz, nx, sq = base(k)
        arange = jnp.arange(N, dtype=jnp.int32)
        scores = jnp.stack(
            [jnp.where(sq <= r * r, arange, N) for r, _ in SCALES], axis=1
        )  # [B, 3, S, N]
        neg, _ = jax.lax.top_k(-scores, 128)
        gi = -neg
        first = gi[..., :1]
        gi = jnp.minimum(jnp.where(gi == N, first, gi), N - 1)
        return sum(gi[:, i, :, :K].sum() for i, (_, K) in enumerate(SCALES))

    rep("sa1_topk_fused(one k=128 call)",
        device_throughput(topk_fused, iters=iters))

    def gathers_fused(k):
        e, xyz, nx, sq = base(k)
        idxs = [query_ball_point(r, K, xyz, nx, sqrdists=sq)
                for r, K in SCALES]
        idx = jnp.concatenate(idxs, axis=-1)          # [B, S, 224]
        g = index_points(jnp.concatenate([e, xyz], -1), idx)  # one gather
        return g.sum()

    rep("sa1_group_gather_fused(one call)",
        device_throughput(gathers_fused, iters=iters))

    def gathers_separate(k):
        e, xyz, nx, sq = base(k)
        acc = 0.0
        for r, K in SCALES:
            idx = query_ball_point(r, K, xyz, nx, sqrdists=sq)
            acc = acc + index_points(e, idx).sum()
            acc = acc + (index_points(xyz, idx) - nx[:, :, None, :]).sum()
        return acc

    rep("sa1_group_separate(6 gathers)",
        device_throughput(gathers_separate, iters=iters))


if __name__ == "__main__":
    if "--fine" in sys.argv:
        sys.argv.remove("--fine")
        fine_breakdown()
    elif "--fused" in sys.argv:
        sys.argv.remove("--fused")
        fused_group_probe()
    else:
        main()
