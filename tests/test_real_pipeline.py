"""Real-data (Ev2Hands-R) pipeline tests on a synthetic pickle recording."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ev2hands_tpu.config import DEFAULT_CONFIG
from ev2hands_tpu.events.erpc import erpc_real_batch_transform
from ev2hands_tpu.events.real_streams import (
    Ev2HandRReader,
    RealStream,
    write_synthetic_ev2hands_r,
)


@pytest.fixture(scope="module")
def recording(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("real") / "subject_1.pickle")
    return write_synthetic_ev2hands_r(path, n_events=30_000, n_frames=20)


@pytest.fixture(scope="module")
def small_cfg():
    c = DEFAULT_CONFIG
    return c.replace(
        model=c.model.__class__(n_points=256, fps_deterministic=True),
        loss=c.loss.__class__(collision_max_pairs=16),
    )


def test_stream_loads_and_windows(recording):
    s = RealStream(recording)
    assert len(s) == 30_000
    w = s.window_at(0, window_ms=2.0, min_events=512, capacity=2048)
    n = int(w["n_events"])
    assert n >= 512
    ev = w["events"][:n]
    # at least window_ms elapsed OR min_events dominated
    assert ev[-1, 2] - ev[0, 2] >= 0
    assert w["events"][n:].sum() == 0
    assert 0 <= w["frame_index"] < 20


def test_stream_end_returns_none(recording):
    s = RealStream(recording)
    assert s.window_at(len(s) - 1) is None


def test_sliding_windows_advance(recording):
    s = RealStream(recording)
    gen = s.sliding_windows(capacity=8192)
    w1 = next(gen)
    w2 = next(gen)
    # advance by ~1ms: start times differ
    assert w2["j3d"].shape == (2, 21, 3)
    assert w1["events"][0, 2] == 0.0  # origin-shifted


def test_gt_frame_rule_first_unique(recording):
    """Sliding-window GT joints come from the FIRST unique frame index in the
    window (reference `joints_3d[:1]` over the sorted unique list,
    evaluation_stream.py:150,184), not the majority frame — which is what
    `frame_index` itself reports (:222-223)."""
    s = RealStream(recording)
    saw_disagreement = False
    for w in s.sliding_windows(capacity=8192):
        np.testing.assert_array_equal(
            w["j3d"], s.joints_3d(int(w["first_frame_index"]))
        )
        assert w["first_frame_index"] <= w["frame_index"]
        if w["first_frame_index"] != w["frame_index"]:
            saw_disagreement = True
            break
    # the synthetic recording has windows straddling frame boundaries, so the
    # two rules must actually disagree somewhere for this test to bite
    assert saw_disagreement


def test_joints_2d_projection(recording):
    s = RealStream(recording)
    j2d = s.joints_2d(0)
    assert j2d.shape == (2, 21, 2)
    assert np.isfinite(j2d).all()


def test_real_batch_transform(recording, small_cfg):
    s = RealStream(recording)
    ws = [s.window_at(i * 3000, capacity=4096) for i in range(4)]
    events = jnp.asarray(np.stack([w["events"] for w in ws]))
    valid = jnp.asarray(np.stack([w["event_valid"] for w in ws]))
    out = erpc_real_batch_transform(
        events, valid, jax.random.PRNGKey(0),
        width=346, height=260, n_out=256,
    )
    assert out.events.shape == (4, 256, 5)
    e = np.asarray(out.events)
    assert np.isfinite(e).all()
    assert e[..., 0].min() >= -1 and e[..., 0].max() <= 1
    # all sampled rows come from real (valid) pixels: polarity counts >= 1
    assert (e[..., 3] + e[..., 4]).min() >= 1


def test_reader_batches(recording):
    reader = Ev2HandRReader(recording, capacity=4096)
    batch = next(reader.batches(2))
    assert batch["events"].shape == (2, 4096, 4)
    assert batch["left"]["j3d"].shape == (2, 21, 3)
    assert batch["left"]["j2d"].shape == (2, 21, 2)


def test_finetune_step(recording, mano_hands, small_cfg):
    from ev2hands_tpu.finetune import make_finetune_step
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.train import build_collision_context, create_train_state

    cfg = small_cfg
    hands = {s: h.params for s, h in mano_hands.items()}
    ctx = build_collision_context(mano_hands)
    net = TEHNet(cfg=cfg.model)
    opt = optax.adam(1e-4)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), opt)
    proj = cfg.camera.projection_matrix(cfg.sensor.width, cfg.sensor.height)
    step = make_finetune_step(net, hands, ctx, cfg, opt, proj)

    reader = Ev2HandRReader(recording, capacity=2048)
    batch = next(reader.batches(2))
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss"]))
    assert {"loss_interpen", "loss_rj3d", "loss_j2d", "regularizer_loss"} <= set(losses)


def test_evaluate_recording(recording, mano_hands, small_cfg, tmp_path):
    from ev2hands_tpu.evaluate_real import evaluate_recording, make_real_eval_step
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.train import build_collision_context, create_train_state

    cfg = small_cfg
    hands = {s: h.params for s, h in mano_hands.items()}
    ctx = build_collision_context(mano_hands)
    net = TEHNet(cfg=cfg.model)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), optax.adam(1e-3))
    step = make_real_eval_step(net, hands, ctx, cfg)

    stream = RealStream(recording)
    report = evaluate_recording(step, state, stream, cfg, batch_size=2, max_windows=4)
    assert report["frames"] >= 2
    assert np.isfinite(report["mpjpe_mm"])
    assert 0 <= report["non_collision_pct"] <= 100
    assert set(report["auc"]) == {"absolute", "relative", "right_root_relative"}

    # tail coverage: a window count that does not divide the batch size must
    # be scored in full (the final partial batch is padded + masked, not
    # dropped)
    report = evaluate_recording(
        step, state, RealStream(recording), cfg, batch_size=4, max_windows=6
    )
    assert report["frames"] == 6


def test_demo_renders_video(recording, small_cfg, tmp_path, monkeypatch):
    import ev2hands_tpu.demo as demo_mod

    # shrink the model for CPU speed
    monkeypatch.setattr(demo_mod, "DEFAULT_CONFIG", small_cfg)
    out, n = demo_mod.run_demo(
        recording, checkpoint_path="", out_path=str(tmp_path / "demo.mp4"),
        batch_size=2, max_windows=3, synthetic_mano=True,
    )
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0
    # 3 % 2 != 0: the final partial batch must be rendered, not dropped
    assert n == 3


def test_demo_device_mesh_render(recording, small_cfg, tmp_path, monkeypatch):
    """--mesh_render device: the mesh pane is z-buffer-rasterized on-device
    inside the one jitted demo step (datagen/rasterizer.rasterize_mesh) and
    the video still carries every window."""
    import ev2hands_tpu.demo as demo_mod

    monkeypatch.setattr(demo_mod, "DEFAULT_CONFIG", small_cfg)
    out, n = demo_mod.run_demo(
        recording, checkpoint_path="", out_path=str(tmp_path / "demo_dev.mp4"),
        batch_size=2, max_windows=3, synthetic_mano=True,
        mesh_render="device",
    )
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0
    assert n == 3


def test_finetune_resume_restores_state(recording, small_cfg, tmp_path, monkeypatch):
    """finetune(resume_dir=...) restores params, batch stats, optimizer state
    and the step counter from a previous run's checkpoint (reference
    `load_network` restart, finetune.py:64-66). Resuming with
    max_iter == saved step runs zero new iterations, so the returned state
    must bitwise-equal the end of the first run."""
    import glob

    from ev2hands_tpu.finetune import finetune

    monkeypatch.chdir(tmp_path)
    cfg = small_cfg.replace(train=small_cfg.train.__class__(
        **{**small_cfg.train.__dict__,
           "batch_size": 2, "eval_batch_size": 2, "msg_iter": 1}))

    state1 = finetune(cfg, recording, "", max_iter=2, save_iter=2,
                      synthetic_mano=True, max_eval_iters=2)
    ckpts = sorted(glob.glob(str(tmp_path / "runs" / "finetune_*" / "ckpt")))
    assert ckpts, "first run must have saved a best checkpoint at step 2"

    state2 = finetune(cfg, recording, "", max_iter=2, save_iter=2,
                      synthetic_mano=True, max_eval_iters=2,
                      resume_dir=ckpts[-1])
    assert int(state2.step) == 2
    for a, b in zip(jax.tree.leaves(jax.device_get(state1.params)),
                    jax.tree.leaves(jax.device_get(state2.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(jax.device_get(state1.opt_state)),
                    jax.tree.leaves(jax.device_get(state2.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # both runs validated on the training recordings (no val_data_root):
    # the loud self-selection warning must be in the run logs
    logs = glob.glob(str(tmp_path / "runs" / "finetune_*" / "log.txt"))
    assert logs and all("val_data_root" in open(p).read() for p in logs)


def test_sliding_window_batches_order_and_count(recording):
    """The prefetched batch generator yields every sliding window exactly
    once, in stream order, with the tail padded and n_valid marking the real
    rows — so the streaming paths (evaluate_real, demo) score/render exactly
    the windows a synchronous loop would."""
    from ev2hands_tpu.events.real_streams import sliding_window_batches
    from ev2hands_tpu.events.streams import Prefetcher

    direct = list(RealStream(recording).sliding_windows())
    batches = list(
        Prefetcher(sliding_window_batches(RealStream(recording), 4))
    )
    flat_ev, flat_gt = [], []
    for b in batches:
        assert b["events"].shape[0] == 4  # static jit shape, tail padded
        flat_ev.extend(b["events"][: b["n_valid"]])
        flat_gt.extend(b["j3d"][: b["n_valid"]])
    assert len(flat_ev) == len(direct)
    for a, g, w in zip(flat_ev, flat_gt, direct):
        np.testing.assert_array_equal(a, w["events"])
        np.testing.assert_array_equal(g, w["j3d"])

    # the max_windows stopping rule of the previous inline loops is preserved
    capped = list(sliding_window_batches(RealStream(recording), 4, max_windows=6))
    assert sum(b["n_valid"] for b in capped) == 6
