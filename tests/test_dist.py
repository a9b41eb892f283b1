"""Multi-device (8 virtual CPU devices) data-parallel tests."""

import jax
import numpy as np
import pytest

from ev2hands_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_and_batch_sharding():
    mesh = create_mesh()
    assert mesh.axis_names == (DATA_AXIS,)
    batch = {"events": np.zeros((8, 16, 4), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert len(sharded["events"].sharding.device_set) == 8


def test_replicate():
    mesh = create_mesh()
    tree = {"w": np.ones((4, 4), np.float32)}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_dryrun_multichip_full_train_step():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_data_parallel_matches_single_device():
    """Loss gradients over the sharded 8-device batch must match the
    single-device gradients (deterministic inference-mode forward: no
    dropout/BN-update noise). This pins the all-reduce/mean semantics."""
    import jax.flatten_util
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.losses import mano_losses, total_loss
    from ev2hands_tpu.model import apply_mano

    cfg = ge._small_cfg(n_points=128, batch=8, collision_pairs=8)
    net, hands, ctx, optimizer, state = ge._build(cfg)
    batch = ge._fake_batch(cfg, 8, np.random.RandomState(3))
    key = jax.random.PRNGKey(0)

    def loss_fn(params, batch_stats, b):
        erpc = erpc_batch_transform(
            b["events"], b["labels"], key,
            width=cfg.sensor.width, height=cfg.sensor.height,
            n_out=cfg.model.n_points, augment=False,
        )
        outputs = net.apply(
            {"params": params, "batch_stats": batch_stats}, erpc.events, train=False
        )
        outputs = apply_mano(hands, outputs)
        targets = {"left": b["left"], "right": b["right"],
                   "handedness": b["handedness"], "class_logits": erpc.labels}
        return total_loss(mano_losses(outputs, targets, hands, ctx, cfg.loss))

    grad = jax.jit(jax.grad(loss_fn))
    g1 = grad(state.params, state.batch_stats, jax.tree.map(jnp.asarray, batch))

    mesh = create_mesh(8)
    g2 = grad(
        replicate(state.params, mesh),
        replicate(state.batch_stats, mesh),
        shard_batch(batch, mesh),
    )

    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    f1, f2 = np.asarray(f1), np.asarray(f2)
    rel = np.linalg.norm(f1 - f2) / (np.linalg.norm(f1) + 1e-12)
    assert rel < 1e-4, rel


def test_mid_train_eval_sharded_matches_unsharded(tmp_path):
    """train.evaluate with the training mesh shards its batches over all 8
    devices (replicated params) and must produce the same PCK metrics as the
    unsharded single-device eval."""
    import __graft_entry__ as ge
    from ev2hands_tpu.events.streams import Ev2HandSReader, write_synthetic_ev2hands_s
    from ev2hands_tpu.train import evaluate, make_eval_step

    cfg = ge._small_cfg(n_points=128, batch=8, collision_pairs=8)
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "eval_batch_size": 8, "max_eval_iters": 16}))
    net, hands, ctx, optimizer, state = ge._build(cfg)

    root = str(tmp_path / "val")
    write_synthetic_ev2hands_s(root, n_events=4096, n_frames=16,
                               width=cfg.sensor.width, height=cfg.sensor.height)
    eval_step = make_eval_step(net, hands, cfg)

    reader = Ev2HandSReader(root, cfg.model.n_points)
    metrics1, score1 = evaluate(eval_step, state, reader, cfg)

    mesh = create_mesh(8)
    reader2 = Ev2HandSReader(root, cfg.model.n_points)
    metrics2, score2 = evaluate(
        eval_step, replicate(state, mesh), reader2, cfg, mesh=mesh)

    assert np.isfinite(score1)
    np.testing.assert_allclose(score1, score2, rtol=1e-5)
    for k in metrics1["auc"]:
        np.testing.assert_allclose(
            metrics1["auc"][k], metrics2["auc"][k], rtol=1e-5)


def test_dcn_two_process_parity(tmp_path):
    """Multi-host DCN path: two localhost jax.distributed processes (4 virtual
    CPU devices each) form one 8-device mesh and must reproduce the
    single-process loss/gradient (scripts/dcn_smoke.py does the comparison;
    its committed output lives in artifacts/dcn_smoke.json)."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "dcn.json")
    proc = subprocess.run(
        [sys.executable, "scripts/dcn_smoke.py", "--out", out],
        cwd="/root/repo", capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out) as f:
        result = json.load(f)
    assert result["ok"], result
    assert result["distributed"]["n_processes"] == 2
