"""Per-layer attribution of the INFERENCE pipeline at the B=16 headline.

The eval-side analogue of scripts/group_breakdown.py: times every stage of
the production inference pipeline standalone — ERPC transform, sa1 (whole +
prep + per-scale via cumulative subsets), sa2, sa3, fp3/fp2/fp1, classifier
trunk, query convs, attention, the regressor pair (shared eval FPS, like
production), MANO — each on its REAL intermediate inputs (captured from one
forward) with key-perturbed operands (the hoist trap, see CLAUDE.md), and
checks that the parts sum to the measured full-pipeline time.

Reference counterpart: none (the reference only wall-clocks the demo
forward, ``src/Ev2Hands/demo.py:24-33``); this is the map behind the
executed-MFU number in bench.py.

Run on the REAL TPU with an otherwise-idle host (~10 min of compiles):
    python scripts/eval_breakdown.py [--batch 16] [--out artifacts/eval_breakdown_b16.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bf16_eval", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import wait_for_tpu
    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
    from ev2hands_tpu.model import TEHNet, apply_mano
    from ev2hands_tpu.model.layers import (
        FeaturePropagation,
        QueryConv,
        SetAbstractionAll,
        SetAbstractionMsg,
        attention_block,
    )
    from ev2hands_tpu.model.tehnet import REGRESSOR_NPOINT, ManoRegressor
    from ev2hands_tpu.ops.pallas_ops import fps_auto
    from ev2hands_tpu.utils.profiling import device_throughput

    wait_for_tpu()
    Bz, n = args.batch, 2048
    cfg = DEFAULT_CONFIG.replace(
        model=DEFAULT_CONFIG.model.__class__(
            n_points=n, fps_deterministic=True, bf16_eval=args.bf16_eval
        )
    )
    mc = cfg.model
    net = TEHNet(cfg=mc)
    hands = {s: h.params for s, h in
             create_mano_hands(synthetic_mano_models(0)).items()}
    variables = jax.jit(
        lambda k: net.init({"params": k}, jnp.zeros((1, n, mc.in_channels)),
                           train=False)
    )(jax.random.PRNGKey(0))
    p, bs = variables["params"], variables["batch_stats"]

    rng = np.random.RandomState(0)
    t = np.sort(rng.randint(0, int(5e6), (Bz, n))).astype(np.float32)
    raw = jnp.asarray(np.stack([
        rng.randint(0, cfg.sensor.width, (Bz, n)).astype(np.float32),
        rng.randint(0, cfg.sensor.height, (Bz, n)).astype(np.float32),
        t,
        rng.randint(0, 2, (Bz, n)).astype(np.float32),
    ], axis=-1))
    labels = jnp.asarray(rng.randint(0, 4, (Bz, n)).astype(np.int32))

    events = erpc_batch_transform(
        raw, labels, jax.random.PRNGKey(0),
        width=cfg.sensor.width, height=cfg.sensor.height, n_out=n,
    ).events
    l0_xyz, l0_points = events[..., :3], events

    # one captured forward provides every stage's real input statistics
    # (jitted: eager apply would be thousands of ~25 ms tunnel dispatches)
    _, inter = jax.jit(lambda v, e: net.apply(
        v, e, train=False, capture_intermediates=True,
        mutable=["intermediates"]))(variables, events)
    top = inter["intermediates"]
    l1_xyz, l1_points = top["sa1"]["__call__"][0]
    l2_xyz, l2_points_sa2 = top["sa2"]["__call__"][0]
    l3_xyz, l3_points = top["sa3"]["__call__"][0]
    l2_points_fp3 = top["fp3"]["__call__"][0]
    l1_points_fp2 = top["fp2"]["__call__"][0]
    l0_feats = top["fp1"]["__call__"][0]
    left_query = top["left_query_conv"]["__call__"][0]
    right_query = top["right_query_conv"]["__call__"][0]

    # classifier trunk recomputed from raw params (k=1 convs + eval BN)
    def classifier(x):
        c0, c1 = p["classifier_conv_0"], p["classifier_conv_1"]
        b, st = p["classifier_bn"], bs["classifier_bn"]
        h = x @ c0["kernel"] + c0["bias"]
        h = jax.nn.relu(h)
        h = (h - st["mean"]) / jnp.sqrt(st["var"] + 1e-5) * b["scale"] + b["bias"]
        return h @ c1["kernel"] + c1["bias"]

    seg_logits = classifier(l0_feats)
    left_features = attention_block(seg_logits, l0_feats, left_query)
    right_features = attention_block(seg_logits, l0_feats, right_query)

    def jit(name):
        return {"params": p[name], "batch_stats": bs[name]}

    def perturb(x, k, eps=1e-6):
        return x + eps * jax.random.normal(k, x.shape, x.dtype)

    def timed(fn, iters):
        """device_throughput with outage-riding retries: the axon tunnel has
        transient unavailable/ResourceExhausted phases (CLAUDE.md) that
        would otherwise kill a 40-min multi-stage run at one stage."""
        for attempt in range(30):
            try:
                return device_throughput(fn, iters=iters)
            except Exception as e:  # noqa: BLE001 — jaxlib runtime errors
                if attempt == 29:
                    raise
                msg = str(e).splitlines()[0][:160] if str(e) else ""
                print(f"# stage failed ({type(e).__name__}: {msg}); waiting "
                      f"out the tunnel and retrying", file=sys.stderr,
                      flush=True)
                time.sleep(180)
                wait_for_tpu()

    results = {}

    def report(name, sec):
        results[name] = round(sec * 1e3, 3)
        print(json.dumps({"component": name, "batch": Bz,
                          "ms_per_batch": results[name]}), flush=True)

    # ---- ERPC ------------------------------------------------------------
    def flip_polarity(ev, k):
        flip = jax.random.bernoulli(k, 0.5, (ev.shape[0], 1))
        pp = ev[:, :, 3]
        return ev.at[:, :, 3].set(jnp.where(flip, 1.0 - pp, pp))

    report("erpc", timed(
        lambda k: erpc_batch_transform(
            flip_polarity(raw, k), labels, k, width=cfg.sensor.width,
            height=cfg.sensor.height, n_out=n).events,
        iters=args.iters))

    # ---- sa1: whole, prep, and per-scale via cumulative subsets ----------
    SA1 = dict(radius_list=(0.1, 0.2, 0.4), nsample_list=(32, 64, 128),
               mlps=((32, 32, 64), (64, 64, 128), (64, 96, 128)))

    def msg_kwargs():
        return dict(grouping=mc.grouping, dense_chunk=mc.dense_chunk,
                    pallas_grouping=mc.pallas_grouping, pallas_nb=mc.pallas_nb,
                    pallas_fused=mc.pallas_fused_msg,
                    rank_ball_query=mc.rank_ball_query,
                    bf16_eval=mc.bf16_eval)

    def sa1_subset(n_scales):
        mod = SetAbstractionMsg(
            npoint=512,
            radius_list=SA1["radius_list"][:n_scales],
            nsample_list=SA1["nsample_list"][:n_scales],
            mlps=SA1["mlps"][:n_scales], **msg_kwargs())
        sub = {
            "params": {k: v for k, v in p["sa1"].items()
                       if int(k.split("_")[1]) < n_scales},
            "batch_stats": {k: v for k, v in bs["sa1"].items()
                            if int(k.split("_")[1]) < n_scales},
        }

        def run(k):
            _, pts = mod.apply(sub, perturb(l0_xyz, k), l0_points, False)
            return pts
        return timed(run, iters=args.iters)

    subset_secs = [sa1_subset(i) for i in (1, 2, 3)]
    report("sa1_total", subset_secs[2])
    report("sa1_scale0_r0.1", subset_secs[0])  # includes shared prep
    report("sa1_scale1_r0.2", subset_secs[1] - subset_secs[0])
    report("sa1_scale2_r0.4", subset_secs[2] - subset_secs[1])

    def sa1_prep(k):
        xyz = perturb(l0_xyz, k)
        from ev2hands_tpu.ops.pointnet import index_points, square_distance
        idx = fps_auto(xyz, 512, key=None)
        new_xyz = index_points(xyz, idx)
        return square_distance(new_xyz, xyz)

    report("sa1_prep_fps_sqrdists", timed(sa1_prep, iters=args.iters))

    # ---- sa2 -------------------------------------------------------------
    sa2 = SetAbstractionMsg(
        npoint=128, radius_list=(0.4, 0.8), nsample_list=(64, 128),
        mlps=((128, 128, 256), (128, 196, 256)), **msg_kwargs())
    report("sa2", timed(
        lambda k: sa2.apply(jit("sa2"), perturb(l1_xyz, k), l1_points,
                            False)[1],
        iters=args.iters))

    # ---- sa3 -------------------------------------------------------------
    sa3 = SetAbstractionAll(mlp=(256, 512, 1024), bf16_eval=mc.bf16_eval)
    report("sa3", timed(
        lambda k: sa3.apply(jit("sa3"), perturb(l2_xyz, k), l2_points_sa2,
                            False)[1],
        iters=args.iters))

    # ---- feature propagation --------------------------------------------
    fp3 = FeaturePropagation(mlp=(256, 256), bf16_eval=mc.bf16_eval)
    report("fp3", timed(
        lambda k: fp3.apply(jit("fp3"), perturb(l2_xyz, k), l3_xyz,
                            l2_points_sa2, l3_points, False),
        iters=args.iters))
    fp2 = FeaturePropagation(mlp=(256, 128), bf16_eval=mc.bf16_eval)
    report("fp2", timed(
        lambda k: fp2.apply(jit("fp2"), perturb(l1_xyz, k), l2_xyz,
                            l1_points, l2_points_fp3, False),
        iters=args.iters))
    fp1 = FeaturePropagation(mlp=(128, 128, 256), bf16_eval=mc.bf16_eval)
    report("fp1", timed(
        lambda k: fp1.apply(jit("fp1"), perturb(l0_xyz, k), l1_xyz,
                            None, l1_points_fp2, False),
        iters=args.iters))

    # ---- heads -----------------------------------------------------------
    report("classifier", timed(
        lambda k: classifier(perturb(l0_feats, k)), iters=args.iters))

    lq = QueryConv(dropout=mc.dropout_query, bf16_eval=mc.bf16_eval)
    report("query_convs_pair", timed(
        lambda k: lq.apply(jit("left_query_conv"), perturb(l0_feats, k),
                           False)
        + lq.apply(jit("right_query_conv"), perturb(l0_feats, k), False),
        iters=args.iters))

    report("attention_pair", timed(
        lambda k: attention_block(perturb(seg_logits, k), l0_feats,
                                  left_query)
        + attention_block(perturb(seg_logits, k), l0_feats, right_query),
        iters=args.iters))

    # ---- regressor pair (shared eval FPS, like production) ---------------
    reg = ManoRegressor(
        dropout=mc.dropout_regressor, grouping=mc.grouping,
        dense_chunk=mc.regressor_dense_chunk,
        pallas_grouping=mc.pallas_grouping, pallas_nb=mc.pallas_nb,
        pallas_fused=mc.pallas_fused_msg,
        rank_ball_query=mc.rank_ball_query, bf16_eval=mc.bf16_eval)

    def reg_pair(k):
        xyz = perturb(l0_xyz, k)
        fps_idx = fps_auto(xyz, REGRESSOR_NPOINT, key=None)
        lo = reg.apply(jit("left_mano_regressor"), xyz,
                       perturb(left_features, k), False, None, fps_idx)
        ro = reg.apply(jit("right_mano_regressor"), xyz,
                       perturb(right_features, k), False, None, fps_idx)
        return sum(jnp.sum(v) for v in lo.values()) + sum(
            jnp.sum(v) for v in ro.values())

    report("regressor_pair", timed(reg_pair, iters=args.iters))

    # ---- MANO ------------------------------------------------------------
    fixed = net.apply(variables, events, train=False)

    def mano_only(k):
        live = jax.tree.map(
            lambda x: x + 1e-6 * jax.random.normal(k, x.shape, x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, fixed)
        return apply_mano(hands, live)["left"]["vertices"]

    report("mano_pair", timed(mano_only, iters=args.iters))

    # ---- full pipeline + sum check ---------------------------------------
    def pipeline(k):
        erpc = erpc_batch_transform(
            flip_polarity(raw, k), labels, k, width=cfg.sensor.width,
            height=cfg.sensor.height, n_out=n)
        out = net.apply(variables, erpc.events, train=False)
        out = apply_mano(hands, out)
        return out["left"]["vertices"]

    report("full_pipeline", timed(pipeline, iters=args.iters))

    parts = ["erpc", "sa1_total", "sa2", "sa3", "fp3", "fp2", "fp1",
             "classifier", "query_convs_pair", "attention_pair",
             "regressor_pair", "mano_pair"]
    s = sum(results[x] for x in parts)
    summary = {
        "batch": Bz, "bf16_eval": bool(args.bf16_eval),
        "sum_of_parts_ms": round(s, 3),
        "full_pipeline_ms": results["full_pipeline"],
        "sum_over_pipeline": round(s / results["full_pipeline"], 3),
        "ms_per_window": round(results["full_pipeline"] / Bz, 4),
        "parts_ms": {x: results[x] for x in parts},
        "sa1_detail_ms": {k: results[k] for k in
                          ("sa1_scale0_r0.1", "sa1_scale1_r0.2",
                           "sa1_scale2_r0.4", "sa1_prep_fps_sqrdists")},
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
