"""Tests for the breadth extras: raw (non-ERPC) input path, forearm/scene
meshes, dataset QA visualizer, device utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ev2hands_tpu.datagen.meshes import (
    estimate_forearm_direction,
    forearm_mesh,
    random_skin_vertex_colors,
    two_hand_scene,
)
from ev2hands_tpu.events.erpc import raw_window_transform


def test_raw_window_transform(rng):
    N = 512
    ev = np.stack([
        rng.randint(0, 64, N), rng.randint(0, 48, N),
        np.sort(rng.randint(0, 10_000, N)), rng.randint(0, 2, N),
    ], -1).astype(np.float32)
    labels = rng.randint(0, 3, N).astype(np.int32)
    out = raw_window_transform(
        jnp.asarray(ev), jnp.asarray(labels), jax.random.PRNGKey(0),
        width=64, height=48, n_out=256,
    )
    e = np.asarray(out.events)
    assert e.shape == (256, 4)
    assert e[:, 0].min() >= -1 and e[:, 0].max() <= 1
    np.testing.assert_allclose(e[:, 2].min(), -1, atol=1e-5)
    np.testing.assert_allclose(e[:, 2].max(), 1, atol=1e-5)
    assert set(np.unique(e[:, 3])) <= {0.0, 1.0}  # polarity raw


def test_raw_window_transform_augment_noise(rng):
    N = 512
    ev = np.stack([
        rng.randint(0, 64, N), rng.randint(0, 48, N),
        np.sort(rng.randint(0, 10_000, N)), rng.randint(0, 2, N),
    ], -1).astype(np.float32)
    labels = rng.randint(0, 3, N).astype(np.int32)
    hit = False
    for s in range(8):
        out = raw_window_transform(
            jnp.asarray(ev), jnp.asarray(labels), jax.random.PRNGKey(s),
            width=64, height=48, n_out=256, augment=True,
        )
        if (np.asarray(out.labels) == 3).any():
            hit = True
            break
    assert hit


def test_non_erpc_model_end_to_end(rng):
    """ModelConfig(erpc=False) consumes the 4-channel raw cloud."""
    from ev2hands_tpu.config import ModelConfig
    from ev2hands_tpu.model import TEHNet

    cfg = ModelConfig(n_points=128, erpc=False, fps_deterministic=True)
    net = TEHNet(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, cfg.in_channels))
    assert cfg.in_channels == 4
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = net.apply(variables, x, train=False)
    assert out["class_logits"].shape == (2, 128, 4)


def test_forearm_mesh_geometry():
    v, f = forearm_mesh(np.zeros(3), np.array([0, 0, 1.0]), length=0.2)
    assert f.min() >= 0 and f.max() < len(v)
    assert abs(v[:, 2].max() - 0.2) < 1e-6  # reaches the elbow
    # all ring vertices at expected radii
    r0 = np.linalg.norm(v[:16, :2], axis=1)
    np.testing.assert_allclose(r0, 0.035, atol=1e-6)


def test_forearm_direction(rng):
    j = rng.randn(21, 3).astype(np.float32)
    d = estimate_forearm_direction(j)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-6)


def test_two_hand_scene(mano_hands, rng):
    outs = {}
    for side in ("left", "right"):
        res = mano_hands[side](jnp.zeros(3), jnp.zeros(6), jnp.zeros(10), jnp.zeros(3))
        outs[side] = {"vertices": np.asarray(res.vertices), "j3d": np.asarray(res.joints)}
    faces = np.asarray(mano_hands["left"].faces)
    scene = two_hand_scene(outs, faces, np.random.RandomState(0))
    assert scene["faces"].max() < len(scene["vertices"])
    assert set(np.unique(scene["materials"])) == {1, 2}
    assert scene["vertex_colors"].shape == (len(scene["vertices"]), 3)
    assert scene["vertex_colors"].min() >= 0 and scene["vertex_colors"].max() <= 1


def test_skin_colors(rng):
    c = random_skin_vertex_colors(100, np.random.RandomState(1))
    assert c.shape == (100, 3)
    assert 0 <= c.min() and c.max() <= 1


def test_qa_visualizer(tmp_path, mano_hands):
    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.datagen.visualize import replay
    from ev2hands_tpu.events.streams import write_synthetic_ev2hands_s

    cfg = DEFAULT_CONFIG.replace(sensor=DEFAULT_CONFIG.sensor.__class__(width=64, height=48))
    root = str(tmp_path / "qa")
    write_synthetic_ev2hands_s(root, n_events=4096, n_frames=4, width=64, height=48)
    out = replay(root, mano_hands, str(tmp_path / "qa.mp4"), cfg=cfg,
                 n_windows=3, window=512)
    assert os.path.getsize(out) > 0


def test_device_memory_stats():
    from ev2hands_tpu.utils.device import get_device_memory_usage

    stats = get_device_memory_usage()
    assert len(stats) == 8  # virtual CPU devices
    assert all("device" in s for s in stats)


def test_p3d_to_p2d():
    from ev2hands_tpu.camera import p3d_to_p2d

    j3d = jnp.asarray([[[1.0, 2.0, 3.0]]])        # [1, 1, 3]
    scale = jnp.asarray([[10.0, 20.0]])            # [1, 2]
    trans = jnp.asarray([[100.0, 200.0]])
    out = np.asarray(p3d_to_p2d(j3d, scale, trans))
    # 180-deg x rotation flips y (and z, which is dropped)
    np.testing.assert_allclose(out[0, 0], [100 + 10 * 1.0, 200 + 20 * -2.0])


def test_evaluate_artifacts(tmp_path):
    from ev2hands_tpu.evaluate import save_artifacts

    report = {
        "pck3d": {"relative": list(np.linspace(0, 1, 51))},
        "auc": {"relative": 0.5},
        "eval_score": 0.5, "mpjpe_mm": 12.3, "mpvpe_mm": 15.6, "frames": 10,
    }
    save_artifacts(report, str(tmp_path))
    assert (tmp_path / "metrics.npy").exists()
    assert (tmp_path / "metrics.json").exists()
    assert (tmp_path / "pck3d_relative.png").exists()


def test_parity_report_synthetic(tmp_path, monkeypatch):
    """scripts/parity_report.py end-to-end on synthetic stand-ins: both
    frameworks forward identical ERPC inputs; the gap must be tiny (same
    weights) and the report asset-ready for the real .pth/MANO/dataset."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import parity_report

    from ev2hands_tpu.events.streams import write_synthetic_ev2hands_s

    root = str(tmp_path / "data")
    write_synthetic_ev2hands_s(f"{root}/test", n_events=20_000, n_frames=4,
                               width=64, height=48)
    report = parity_report.run_report(
        pth=None, mano_dir="", data_root=root, split="test",
        batch_size=2, stride=8192, max_batches=2, synthetic=True,
        n_points=256,
    )
    assert report["frames"] >= 2
    assert np.isfinite(report["ours"]["mpjpe_mm"])
    assert "reference" in report and "gap_pct" in report
    # same weights, same inputs: the two frameworks agree well within 1%
    assert report["gap_pct"]["mpjpe"] < 1.0
    assert report["within_1pct"]
