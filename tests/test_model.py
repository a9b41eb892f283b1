"""TEHNet structure/shape/semantics tests (small N for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ev2hands_tpu.config import ModelConfig
from ev2hands_tpu.model import TEHNet, apply_mano, attention_block, tehnet_forward


@pytest.fixture(scope="module")
def small_net():
    cfg = ModelConfig(n_points=256, fps_deterministic=True)
    net = TEHNet(cfg=cfg)
    x = jnp.zeros((2, 256, 5))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return net, variables


def test_forward_shapes(small_net):
    net, variables = small_net
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 5))
    out = net.apply(variables, x, train=False)
    assert out["class_logits"].shape == (2, 256, 4)
    for side in ("left", "right"):
        assert out[side]["global_orient"].shape == (2, 3)
        assert out[side]["hand_pose"].shape == (2, 6)
        assert out[side]["betas"].shape == (2, 10)
        assert out[side]["transl"].shape == (2, 3)


def test_param_tree_structure(small_net):
    net, variables = small_net
    p = variables["params"]
    # encoder/decoder blocks present with torch-mirroring leaf names
    for blk in ("sa1", "sa2", "sa3", "fp3", "fp2", "fp1"):
        assert blk in p, sorted(p)
    assert p["sa1"]["conv_0_0"]["kernel"].shape == (8, 32)     # (5+3) -> 32
    assert p["sa2"]["conv_1_2"]["kernel"].shape == (196, 256)
    assert p["sa3"]["conv_2"]["kernel"].shape == (512, 1024)
    assert p["fp3"]["conv_0"]["kernel"].shape == (1536, 256)
    assert p["fp2"]["conv_0"]["kernel"].shape == (576, 256)
    assert p["fp1"]["conv_0"]["kernel"].shape == (128, 128)
    assert p["classifier_conv_1"]["kernel"].shape == (256, 4)
    assert p["left_query_conv"]["conv_0"]["kernel"].shape == (3, 256, 256)
    assert p["left_mano_regressor"]["sa1"]["conv_0_0"]["kernel"].shape == (7, 128)
    assert p["left_mano_regressor"]["fc_0"]["kernel"].shape == (512, 1024)
    assert p["left_mano_regressor"]["fc_1"]["kernel"].shape == (1024, 22)


def test_param_count_matches_reference_architecture(small_net):
    """Total trainable parameter count is architecture-determined; computed
    independently from the reference channel spec."""
    net, variables = small_net
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(variables["params"]))

    def conv(i, o):  # 1x1 conv + bias
        return i * o + o

    def bn(c):
        return 2 * c

    def msg(in_ch, mlps):
        total = 0
        for mlp in mlps:
            last = in_ch + 3
            for w in mlp:
                total += conv(last, w) + bn(w)
                last = w
        return total

    expect = 0
    expect += msg(5, [[32, 32, 64], [64, 64, 128], [64, 96, 128]])      # sa1
    expect += msg(320, [[128, 128, 256], [128, 196, 256]])              # sa2
    last = 512 + 3
    for w in (256, 512, 1024):
        expect += conv(last, w) + bn(w); last = w                        # sa3
    for in_ch, mlp in ((1536, (256, 256)), (576, (256, 128)), (128, (128, 128, 256))):
        last = in_ch
        for w in mlp:
            expect += conv(last, w) + bn(w); last = w                    # fp3/2/1
    expect += conv(256, 256) + bn(256) + conv(256, 4)                    # classifier
    expect += 2 * (2 * (3 * 256 * 256 + 256) + 2 * bn(256))              # query convs
    per_reg = msg(4, [[128, 128, 256], [128, 196, 256]])
    last = 512 + 3
    for w in (256, 512):
        per_reg += conv(last, w) + bn(w); last = w
    per_reg += (512 * 1024 + 1024) + bn(1024) + (1024 * 22 + 22)
    expect += 2 * per_reg
    assert int(n) == expect


def test_attention_block_semantics(rng):
    """Oracle executes the reference's bmm chain *including* its variable
    shadowing: ``N, KC = key.shape[:2]`` is immediately overwritten by
    ``N, KC = value.shape[:2]`` (TEHNet.py:14-22), so the softmax scale is
    the value channel count C, not the class count KC.  Moderate-magnitude
    inputs keep the softmax far from saturation so a wrong scale fails."""
    import torch

    B, N, KC, C = 2, 16, 4, 8
    key = jnp.asarray(rng.randn(B, N, KC), jnp.float32)
    value = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    query = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    out = np.asarray(attention_block(key, value, query))
    assert out.shape == (B, N, KC)

    # torch oracle in the reference's channels-first layout (TEHNet.py:13-27)
    k = torch.from_numpy(np.asarray(key).transpose(0, 2, 1)).contiguous()
    v = torch.from_numpy(np.asarray(value).transpose(0, 2, 1)).contiguous()
    q = torch.from_numpy(np.asarray(query).transpose(0, 2, 1)).contiguous()
    q = q.permute(0, 2, 1)
    _, kc_shadowed = k.shape[:2]        # key view: KC = 4 ...
    _, kc_shadowed = v.shape[:2]        # ... shadowed by value: KC = C = 8
    sim = torch.bmm(k.view(B, KC, -1), q) * (kc_shadowed ** -0.5)
    sim = torch.softmax(sim, dim=1)
    ctx = torch.bmm(sim, v.view(B, C, -1))  # [B, KC, N]
    np.testing.assert_allclose(out, ctx.numpy().transpose(0, 2, 1), atol=1e-4)

    # the misread class-count scale (4**-0.5) must NOT match at these magnitudes
    wrong = torch.softmax(torch.bmm(k.view(B, KC, -1), q) * (KC ** -0.5), dim=1)
    wrong_ctx = torch.bmm(wrong, v.view(B, C, -1)).numpy().transpose(0, 2, 1)
    assert np.abs(out - wrong_ctx).max() > 1e-3


def test_fused_regressor_matches_separate(rng):
    """The h-stacked two-hand regressor fast path produces the same outputs
    as the two separate flax heads (eval, dense mode)."""
    from ev2hands_tpu.config import ModelConfig

    N = 256
    events = jnp.asarray(
        np.concatenate([
            rng.rand(2, N, 2) * 2 - 1,
            np.sort(rng.rand(2, N, 1) * 2 - 1, 1),
            rng.randint(1, 5, (2, N, 2)),
        ], axis=-1), jnp.float32,
    )
    cfg_sep = ModelConfig(n_points=N, fps_deterministic=True,
                          grouping="dense", fused_regressors=False)
    cfg_fused = ModelConfig(n_points=N, fps_deterministic=True,
                            grouping="dense", fused_regressors=True)
    net_sep = TEHNet(cfg=cfg_sep)
    variables = net_sep.init(
        {"params": jax.random.PRNGKey(0)}, events, train=False
    )
    # perturb BN running stats so the fold is non-trivial
    variables = jax.tree.map(lambda a: a + 0.03 if a.ndim == 1 else a, variables)

    ref = net_sep.apply(variables, events, train=False)
    got = TEHNet(cfg=cfg_fused).apply(variables, events, train=False)

    np.testing.assert_allclose(
        np.asarray(got["class_logits"]), np.asarray(ref["class_logits"])
    )
    for side in ("left", "right"):
        for k in ("global_orient", "hand_pose", "betas", "transl"):
            np.testing.assert_allclose(
                np.asarray(got[side][k]), np.asarray(ref[side][k]),
                rtol=1e-4, atol=1e-4, err_msg=f"{side}/{k}",
            )


def test_train_mode_updates_batch_stats(small_net):
    net, variables = small_net
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 256, 5))
    out, updates = net.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(3), "fps": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    old = variables["batch_stats"]["sa1"]["bn_0_0"]["mean"]
    new = updates["batch_stats"]["sa1"]["bn_0_0"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_full_forward_with_mano(small_net, mano_hands):
    net, variables = small_net
    hands = {s: h.params for s, h in mano_hands.items()}
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 256, 5))
    out, _ = tehnet_forward(net, variables, hands, x, train=False)
    assert out["left"]["vertices"].shape == (2, 778, 3)
    assert out["right"]["j3d"].shape == (2, 21, 3)
    assert np.all(np.isfinite(np.asarray(out["left"]["vertices"])))


def test_forward_jits_and_is_deterministic(small_net):
    net, variables = small_net
    fwd = jax.jit(lambda v, x: net.apply(v, x, train=False))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 256, 5))
    a = fwd(variables, x)
    b = fwd(variables, x)
    np.testing.assert_array_equal(
        np.asarray(a["class_logits"]), np.asarray(b["class_logits"])
    )


def test_mhlnes_changes_geometry_branch():
    cfg = ModelConfig(n_points=64, mhlnes=True, fps_deterministic=True)
    net = TEHNet(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 5))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = net.apply(variables, x, train=False)
    assert out["class_logits"].shape == (1, 64, 4)


def test_dense_grouping_matches_gather():
    """Eval-mode forward must be numerically equivalent between the dense
    masked grouping and the reference's gather formulation."""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 192, 5))
    outs = {}
    for grouping in ("gather", "dense"):
        cfg = ModelConfig(n_points=192, fps_deterministic=True, grouping=grouping)
        net = TEHNet(cfg=cfg)
        variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        outs[grouping] = net.apply(variables, x, train=False)

    for key in ("class_logits",):
        np.testing.assert_allclose(
            np.asarray(outs["gather"][key]), np.asarray(outs["dense"][key]),
            atol=1e-4,
        )
    for side in ("left", "right"):
        for k in ("global_orient", "hand_pose", "betas", "transl"):
            np.testing.assert_allclose(
                np.asarray(outs["gather"][side][k]),
                np.asarray(outs["dense"][side][k]),
                atol=2e-3, rtol=1e-3,
            )


def test_per_layer_grouping_overrides():
    """grouping_sa1/_sa2/_regressor override the global mode per layer; a
    mixed config's eval forward is bitwise the gather forward for the
    overridden layers (the override routes to the same branch)."""
    import jax

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 192, 5))
    cfg_g = ModelConfig(n_points=192, fps_deterministic=True, grouping="gather")
    cfg_m = ModelConfig(
        n_points=192, fps_deterministic=True, grouping="dense",
        grouping_sa1="gather", grouping_sa2="gather",
        grouping_regressor="gather",
    )
    net_g = TEHNet(cfg=cfg_g)
    variables = net_g.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out_g = net_g.apply(variables, x, train=False)
    out_m = TEHNet(cfg=cfg_m).apply(variables, x, train=False)
    # every SA layer overridden to gather -> identical programs
    np.testing.assert_array_equal(
        np.asarray(out_g["class_logits"]), np.asarray(out_m["class_logits"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_g["left"]["transl"]), np.asarray(out_m["left"]["transl"])
    )


def test_dense_train_bn_stats_match_gather():
    """The dense TRAINING formulation (multiplicity-weighted BN stats,
    layers.SetAbstractionMsg._dense_train_scale) must reproduce the gather
    path's training forward exactly: pooled outputs, the updated BatchNorm
    batch statistics over the selected-neighbor multiset (backfill
    duplicates included), and the parameter gradients."""
    import jax.flatten_util

    from ev2hands_tpu.model.layers import SetAbstractionMsg

    key = jax.random.PRNGKey(3)
    B, N, D = 2, 192, 5
    xyz = jax.random.normal(key, (B, N, 3)) * 0.5
    pts = jax.random.normal(jax.random.fold_in(key, 1), (B, N, D))

    def build(grouping, dense_train):
        return SetAbstractionMsg(
            npoint=48,
            radius_list=(0.2, 0.4),
            nsample_list=(8, 16),
            mlps=((16, 16, 32), (16, 24, 32)),
            grouping=grouping,
            dense_train=dense_train,
            dense_chunk=16,
            pallas_grouping=False,
        )

    ref = build("gather", False)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, xyz, pts, True)

    outs, stats, grads = {}, {}, {}
    for name, mod in (("gather", ref), ("dense", build("dense", True))):
        def fwd(params):
            (nx, np_), upd = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xyz, pts, True, mutable=["batch_stats"],
            )
            return jnp.sum(np_**2), (np_, upd["batch_stats"])

        (loss, (out, st)), g = jax.value_and_grad(fwd, has_aux=True)(
            variables["params"]
        )
        outs[name], stats[name], grads[name] = out, st, g

    np.testing.assert_allclose(
        np.asarray(outs["gather"]), np.asarray(outs["dense"]), atol=5e-5
    )
    # updated running stats: batch mean/var over the same multiset
    g_leaves = jax.tree.leaves_with_path(stats["gather"])
    d_leaves = jax.tree.leaves_with_path(stats["dense"])
    for (pg, lg), (pd, ld) in zip(g_leaves, d_leaves):
        assert pg == pd
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(ld), atol=2e-5,
            err_msg=str(pg),
        )
    fg, _ = jax.flatten_util.ravel_pytree(grads["gather"])
    fd, _ = jax.flatten_util.ravel_pytree(grads["dense"])
    rel = np.linalg.norm(np.asarray(fg) - np.asarray(fd)) / (
        np.linalg.norm(np.asarray(fg)) + 1e-12
    )
    assert rel < 1e-4, rel


def test_dense_train_full_model_matches_gather():
    """Full TEHNet training forward + batch stats + grads: dense_train ==
    gather, compared in float64 where accumulation-order noise vanishes
    (in f32 the ~1e-5 per-layer noise amplifies through the 10-layer stack
    and flips relu-boundary gradient masks; both paths are equally 'right'
    there — the per-layer f32 exactness lives in
    test_dense_train_bn_stats_match_gather)."""
    import jax.flatten_util

    jax.config.update("jax_enable_x64", True)
    try:
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 192, 5),
                              dtype=jnp.float64)
        res = {}
        for grouping, dense_train in (("gather", False), ("dense", True)):
            # one big chunk: 8x smaller unrolled program, much faster
            # compile; chunking is a memory knob, not a numerics one
            cfg = ModelConfig(n_points=192, fps_deterministic=True,
                              grouping=grouping, dense_train=dense_train,
                              dense_chunk=512, regressor_dense_chunk=512,
                              pallas_grouping=False)
            net = TEHNet(cfg=cfg)
            variables = net.init({"params": jax.random.PRNGKey(0)}, x,
                                 train=False)
            variables = jax.tree.map(
                lambda a: a.astype(jnp.float64)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)

            def fwd(params):
                out, upd = net.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(11),
                          "fps": jax.random.PRNGKey(12)},
                    mutable=["batch_stats"],
                )
                loss = (jnp.sum(out["class_logits"] ** 2)
                        + sum(jnp.sum(out[s][k] ** 2)
                              for s in ("left", "right")
                              for k in ("global_orient", "hand_pose",
                                        "betas", "transl")))
                return loss, (out, upd["batch_stats"])

            (loss, (out, st)), g = jax.value_and_grad(fwd, has_aux=True)(
                variables["params"]
            )
            res[grouping] = (float(loss), out, st, g)

        assert np.isfinite(res["gather"][0])
        np.testing.assert_allclose(res["gather"][0], res["dense"][0],
                                   rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(res["gather"][1]["class_logits"]),
            np.asarray(res["dense"][1]["class_logits"]), atol=1e-9,
        )
        sg = jax.tree.leaves_with_path(res["gather"][2])
        sd = jax.tree.leaves_with_path(res["dense"][2])
        for (pg, lg), (pd, ld) in zip(sg, sd):
            assert pg == pd
            np.testing.assert_allclose(np.asarray(lg), np.asarray(ld),
                                       rtol=1e-9, atol=1e-9, err_msg=str(pg))
        fg, _ = jax.flatten_util.ravel_pytree(res["gather"][3])
        fd, _ = jax.flatten_util.ravel_pytree(res["dense"][3])
        rel = np.linalg.norm(np.asarray(fg) - np.asarray(fd)) / (
            np.linalg.norm(np.asarray(fg)) + 1e-30
        )
        assert rel < 1e-8, rel
    finally:
        jax.config.update("jax_enable_x64", False)


def test_uv_gather_matches_gather_train():
    """The gather-mode u/v first-conv split (``uv_gather``: conv0 applied per
    point before the gather, pair activation reconstructed as u_n - v_s + b)
    must reproduce the plain gather path's TRAINING forward: pooled outputs,
    updated BatchNorm batch statistics (same selected-neighbor multiset),
    and parameter gradients — up to float accumulation order."""
    import jax.flatten_util

    from ev2hands_tpu.model.layers import SetAbstractionMsg

    key = jax.random.PRNGKey(3)
    B, N, D = 2, 192, 5
    xyz = jax.random.normal(key, (B, N, 3)) * 0.5
    pts = jax.random.normal(jax.random.fold_in(key, 1), (B, N, D))

    def build(uv):
        return SetAbstractionMsg(
            npoint=48,
            radius_list=(0.2, 0.4),
            nsample_list=(8, 16),
            mlps=((16, 16, 32), (16, 24, 32)),
            grouping="gather",
            uv_gather=uv,
            pallas_grouping=False,
        )

    ref = build(False)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, xyz, pts, True)
    # identical param tree: the uv path creates the same conv_{i}_{j} /
    # bn_{i}_{j} modules, just earlier in the trace
    uv_vars = build(True).init(
        {"params": jax.random.PRNGKey(0)}, xyz, pts, True
    )
    assert jax.tree.structure(variables) == jax.tree.structure(uv_vars)

    outs, stats, grads = {}, {}, {}
    for name, mod in (("gather", ref), ("uv", build(True))):
        def fwd(params):
            (nx, np_), upd = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xyz, pts, True, mutable=["batch_stats"],
            )
            return jnp.sum(np_**2), (np_, upd["batch_stats"])

        (loss, (out, st)), g = jax.value_and_grad(fwd, has_aux=True)(
            variables["params"]
        )
        outs[name], stats[name], grads[name] = out, st, g

    np.testing.assert_allclose(
        np.asarray(outs["gather"]), np.asarray(outs["uv"]), atol=5e-5
    )
    g_leaves = jax.tree.leaves_with_path(stats["gather"])
    d_leaves = jax.tree.leaves_with_path(stats["uv"])
    for (pg, lg), (pd, ld) in zip(g_leaves, d_leaves):
        assert pg == pd
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(ld), atol=2e-5, err_msg=str(pg),
        )
    fg, _ = jax.flatten_util.ravel_pytree(grads["gather"])
    fd, _ = jax.flatten_util.ravel_pytree(grads["uv"])
    rel = np.linalg.norm(np.asarray(fg) - np.asarray(fd)) / (
        np.linalg.norm(np.asarray(fg)) + 1e-12
    )
    assert rel < 1e-4, rel


def test_uv_gather_full_model_train_step_close():
    """Full TEHNet training forward + loss + batch stats + grads:
    uv_split_gather == plain gather, compared in float64 where the u/v
    linearity identity is exact (in f32 the ~1e-6 per-layer rounding
    amplifies through the 10-layer stack and flips max-pool/relu selection,
    exactly like the dense_train comparison above — the per-layer f32
    closeness lives in test_uv_gather_matches_gather_train)."""
    import jax.flatten_util

    jax.config.update("jax_enable_x64", True)
    try:
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 192, 5),
                              dtype=jnp.float64)
        res = {}
        for name, uv in (("gather", False), ("uv", True)):
            cfg = ModelConfig(n_points=192, fps_deterministic=True,
                              grouping="gather", uv_split_gather=uv,
                              pallas_grouping=False)
            net = TEHNet(cfg=cfg)
            variables = net.init({"params": jax.random.PRNGKey(0)}, x,
                                 train=False)
            variables = jax.tree.map(
                lambda a: a.astype(jnp.float64)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)

            def fwd(params):
                out, upd = net.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(11),
                          "fps": jax.random.PRNGKey(12)},
                    mutable=["batch_stats"],
                )
                loss = (jnp.sum(out["class_logits"] ** 2)
                        + sum(jnp.sum(out[s][k] ** 2)
                              for s in ("left", "right")
                              for k in ("global_orient", "hand_pose",
                                        "betas", "transl")))
                return loss, (out, upd["batch_stats"])

            (loss, (out, st)), g = jax.value_and_grad(fwd, has_aux=True)(
                variables["params"]
            )
            res[name] = (float(loss), out, st, g)

        assert np.isfinite(res["gather"][0])
        np.testing.assert_allclose(res["gather"][0], res["uv"][0], rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(res["gather"][1]["class_logits"]),
            np.asarray(res["uv"][1]["class_logits"]), atol=1e-9,
        )
        sg = jax.tree.leaves_with_path(res["gather"][2])
        sd = jax.tree.leaves_with_path(res["uv"][2])
        for (pg, lg), (pd, ld) in zip(sg, sd):
            assert pg == pd
            np.testing.assert_allclose(np.asarray(lg), np.asarray(ld),
                                       rtol=1e-9, atol=1e-9, err_msg=str(pg))
        fg, _ = jax.flatten_util.ravel_pytree(res["gather"][3])
        fd, _ = jax.flatten_util.ravel_pytree(res["uv"][3])
        rel = np.linalg.norm(np.asarray(fg) - np.asarray(fd)) / (
            np.linalg.norm(np.asarray(fg)) + 1e-30
        )
        assert rel < 1e-8, rel
    finally:
        jax.config.update("jax_enable_x64", False)
