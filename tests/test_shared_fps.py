"""ModelConfig.shared_head_fps semantics.

During random-FPS training the reference draws an independent FPS start per
regressor head (``TEHNet.py:194-195``); ``shared_head_fps=True`` feeds ONE
random draw (keys[2]) to both heads so their sa1 sampling machinery CSEs
(the keys-are-None eval/deterministic path already shares it via
``reg_fps_idx``). Asserted here via ``capture_intermediates``:

  * shared ON + train: both heads' sa1 centroid sets are identical;
  * shared OFF + train: the heads' centroid sets differ (independent draws);
  * eval outputs are bit-identical regardless of the knob (it only routes
    the random-training path).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ev2hands_tpu.config import ModelConfig
from ev2hands_tpu.model import TEHNet

B, N = 2, 128


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(n_points=N, grouping="gather")
    net = TEHNet(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 5))
    variables = net.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    return cfg, x, variables


def _head_sa1_xyz(cfg, x, variables, train):
    net = TEHNet(cfg=cfg)
    _, state = net.apply(
        variables, x, train=train,
        rngs={"dropout": jax.random.PRNGKey(2), "fps": jax.random.PRNGKey(3)}
        if train else {},
        capture_intermediates=lambda mdl, name: mdl.name == "sa1",
        mutable=["intermediates", "batch_stats"] if train else ["intermediates"],
    )
    inter = state["intermediates"]
    out = {}
    for side in ("left", "right"):
        l1_xyz, _ = inter[f"{side}_mano_regressor"]["sa1"]["__call__"][0]
        out[side] = np.asarray(l1_xyz)
    return out


def test_shared_draw_makes_head_sampling_identical(setup):
    cfg, x, variables = setup
    xyz = _head_sa1_xyz(dataclasses.replace(cfg, shared_head_fps=True), x, variables,
                        train=True)
    np.testing.assert_array_equal(xyz["left"], xyz["right"])


def test_independent_draws_differ(setup):
    cfg, x, variables = setup
    xyz = _head_sa1_xyz(cfg, x, variables, train=True)
    assert not np.array_equal(xyz["left"], xyz["right"]), (
        "independent per-head FPS draws produced identical centroid sets — "
        "the reference's TEHNet.py:194-195 semantics are not being honored")


def test_eval_unaffected(setup):
    cfg, x, variables = setup
    net_off = TEHNet(cfg=cfg)
    net_on = TEHNet(cfg=dataclasses.replace(cfg, shared_head_fps=True))
    out_off = net_off.apply(variables, x, train=False)
    out_on = net_on.apply(variables, x, train=False)
    flat_off = jax.tree_util.tree_leaves(out_off)
    flat_on = jax.tree_util.tree_leaves(out_on)
    for a, b in zip(flat_off, flat_on):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shared_train_step_runs_and_losses_finite(setup):
    """The knob must compose with the full train step (grads flow through
    the shared sampling exactly once)."""
    cfg, x, variables = setup

    def loss_fn(params):
        net = TEHNet(cfg=dataclasses.replace(cfg, shared_head_fps=True))
        out, _ = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True,
            rngs={"dropout": jax.random.PRNGKey(2),
                  "fps": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        return (jnp.mean(out["class_logits"] ** 2)
                + sum(jnp.mean(v ** 2) for v in out["left"].values())
                + sum(jnp.mean(v ** 2) for v in out["right"].values()))

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0.0
