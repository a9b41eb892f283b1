"""Serving export (ev2hands_tpu/export.py): the serialized StableHLO
artifact reproduces the live inference pipeline bitwise and round-trips
through disk. CPU-platform export here; the same API exports for TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ev2hands_tpu.config import DEFAULT_CONFIG
from ev2hands_tpu.export import export_serving, load_serving, make_serving_fn
from ev2hands_tpu.model import TEHNet
from ev2hands_tpu.train import build_hands, create_train_state


@pytest.fixture(scope="module")
def setup():
    c = DEFAULT_CONFIG
    cfg = c.replace(
        model=c.model.__class__(n_points=128, fps_deterministic=True),
        sensor=c.sensor.__class__(width=64, height=48),
    )
    hands_obj = build_hands(cfg, synthetic=True)
    hands = {s: h.params for s, h in hands_obj.items()}
    net = TEHNet(cfg=cfg.model)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0),
                               optax.adam(1e-3))
    weights = {"params": state.params, "batch_stats": state.batch_stats}

    rng = np.random.RandomState(0)
    B, N = 2, 512
    events = np.stack([
        rng.randint(0, cfg.sensor.width, (B, N)).astype(np.float32),
        rng.randint(0, cfg.sensor.height, (B, N)).astype(np.float32),
        np.sort(rng.rand(B, N).astype(np.float32) * 2.0, axis=-1),  # ms
        rng.randint(0, 2, (B, N)).astype(np.float32),
    ], axis=-1)
    valid = np.ones((B, N), bool)
    valid[1, 400:] = False
    return cfg, net, hands, weights, jnp.asarray(events), jnp.asarray(valid)


def test_export_roundtrip_bitwise(setup, tmp_path):
    cfg, net, hands, weights, events, valid = setup
    path = str(tmp_path / "tehnet.jaxexport")
    data = export_serving(
        net, hands, cfg, weights, batch_size=2,
        max_events=events.shape[1], platforms=("cpu",), path=path,
    )
    assert len(data) > 1000
    served = load_serving(path)

    key = jax.random.PRNGKey(7)
    key_data = jax.random.key_data(key)
    got = served(events, valid, key_data)

    # jit the live reference: the artifact is a compiled program, and
    # eager-vs-jitted fusion differ at float summation order
    live = jax.jit(make_serving_fn(net, hands, cfg, weights=weights))
    want = live(events, valid, key)

    assert sorted(got.keys()) == sorted(want.keys())
    for k in want:
        assert np.array_equal(np.asarray(got[k]), np.asarray(want[k])), k
    assert got["left_vertices"].shape == (2, 778, 3)
    assert got["seg"].shape == (2, cfg.model.n_points)


def test_export_tpu_platform_lowering(setup):
    """Cross-platform lowering: a TPU-platform artifact exports from this
    CPU-only host (no execution here — the lowering itself is the check;
    Pallas gates are off at CPU trace time, so the module is pure XLA)."""
    cfg, net, hands, weights, events, valid = setup
    data = export_serving(
        net, hands, cfg, weights, batch_size=2,
        max_events=events.shape[1], platforms=("tpu",),
    )
    assert len(data) > 1000


def test_export_data_parallel_8(setup, tmp_path):
    """Multi-chip serving artifact: batch sharded over an 8-device 'data'
    mesh, outputs equal to the single-device artifact's."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    cfg, net, hands, weights, events, valid = setup
    # 8 windows: tile the 2-window fixture
    ev8 = jnp.tile(events, (4, 1, 1))
    va8 = jnp.tile(valid, (4, 1))
    key = jax.random.PRNGKey(7)
    key_data = jax.random.key_data(key)

    data = export_serving(
        net, hands, cfg, weights, batch_size=8,
        max_events=events.shape[1], platforms=("cpu",), data_parallel=8,
    )
    served = load_serving(data)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    bsh = NamedSharding(mesh, PartitionSpec("data"))
    rep = NamedSharding(mesh, PartitionSpec())
    got = served(
        jax.device_put(ev8, bsh), jax.device_put(va8, bsh),
        jax.device_put(key_data, rep),
    )

    single = export_serving(
        net, hands, cfg, weights, batch_size=8,
        max_events=events.shape[1], platforms=("cpu",),
    )
    want = load_serving(single)(ev8, va8, key_data)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-6, atol=1e-6
        )


def test_export_event_sharded(setup):
    """Context-parallel serving artifact: a (data=2, event=4) mesh module
    (the event dimension sharded inside via shard_map) exports, reloads,
    and matches the single-device artifact to float-reassociation level."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    cfg, net, hands, weights, events, valid = setup
    cfg_ev = cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "event_parallel": True}))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "event"))
    net_ev = TEHNet(cfg=cfg_ev.model, event_mesh=mesh)

    data = export_serving(
        net_ev, hands, cfg_ev, weights, batch_size=2,
        max_events=events.shape[1], platforms=("cpu",), mesh=mesh,
    )
    served = load_serving(data)

    key_data = jax.random.key_data(jax.random.PRNGKey(7))
    bsh = NamedSharding(mesh, PartitionSpec("data"))
    rep = NamedSharding(mesh, PartitionSpec())
    got = served(
        jax.device_put(events, bsh), jax.device_put(valid, bsh),
        jax.device_put(key_data, rep),
    )

    single = export_serving(
        net, hands, cfg, weights, batch_size=2,
        max_events=events.shape[1], platforms=("cpu",),
    )
    want = load_serving(single)(events, valid, key_data)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5
        )
