"""Checkpoint ingestion tests.

Builds a synthetic torch ``state_dict`` with the exact key/shape layout the
reference trainer saves (derived from the architecture spec, SURVEY.md §2.1),
then checks: full-coverage conversion against ``TEHNet.init``, exact
round-trip, and numerical parity of the converted heads against live torch
modules (Conv1x1+BN+..., Linear+BN1d stacks).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ev2hands_tpu.checkpoint import (
    flax_to_torch,
    load_pth_checkpoint,
    torch_to_flax,
    verify_against_template,
)
from ev2hands_tpu.config import ModelConfig
from ev2hands_tpu.model import TEHNet


def _bn_entries(sd, prefix, c, rng):
    sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
    sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
    sd[f"{prefix}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = np.array(10, np.int64)


def _msg_entries(sd, prefix, in_ch, mlps, rng):
    for i, mlp in enumerate(mlps):
        last = in_ch + 3
        for j, w in enumerate(mlp):
            sd[f"{prefix}.conv_blocks.{i}.{j}.weight"] = rng.randn(w, last, 1, 1).astype(np.float32) * 0.1
            sd[f"{prefix}.conv_blocks.{i}.{j}.bias"] = rng.randn(w).astype(np.float32) * 0.1
            _bn_entries(sd, f"{prefix}.bn_blocks.{i}.{j}", w, rng)
            last = w


def _sa_entries(sd, prefix, in_ch, mlp, rng):
    last = in_ch
    for j, w in enumerate(mlp):
        sd[f"{prefix}.mlp_convs.{j}.weight"] = rng.randn(w, last, 1, 1).astype(np.float32) * 0.1
        sd[f"{prefix}.mlp_convs.{j}.bias"] = rng.randn(w).astype(np.float32) * 0.1
        _bn_entries(sd, f"{prefix}.mlp_bns.{j}", w, rng)
        last = w


def _fp_entries(sd, prefix, in_ch, mlp, rng):
    last = in_ch
    for j, w in enumerate(mlp):
        sd[f"{prefix}.mlp_convs.{j}.weight"] = rng.randn(w, last, 1).astype(np.float32) * 0.1
        sd[f"{prefix}.mlp_convs.{j}.bias"] = rng.randn(w).astype(np.float32) * 0.1
        _bn_entries(sd, f"{prefix}.mlp_bns.{j}", w, rng)
        last = w


def build_reference_state_dict(rng, prefix=""):
    """Exact key/shape layout of the reference TEHNet state_dict."""
    sd = {}
    _msg_entries(sd, "sa1", 5, [[32, 32, 64], [64, 64, 128], [64, 96, 128]], rng)
    _msg_entries(sd, "sa2", 320, [[128, 128, 256], [128, 196, 256]], rng)
    _sa_entries(sd, "sa3", 515, [256, 512, 1024], rng)
    _fp_entries(sd, "fp3", 1536, [256, 256], rng)
    _fp_entries(sd, "fp2", 576, [256, 128], rng)
    _fp_entries(sd, "fp1", 128, [128, 128, 256], rng)

    sd["classifier.0.weight"] = rng.randn(256, 256, 1).astype(np.float32) * 0.1
    sd["classifier.0.bias"] = rng.randn(256).astype(np.float32) * 0.1
    _bn_entries(sd, "classifier.2", 256, rng)
    sd["classifier.4.weight"] = rng.randn(4, 256, 1).astype(np.float32) * 0.1
    sd["classifier.4.bias"] = rng.randn(4).astype(np.float32) * 0.1

    for side in ("left", "right"):
        q = f"{side}_query_conv"
        sd[f"{q}.0.weight"] = rng.randn(256, 256, 3).astype(np.float32) * 0.1
        sd[f"{q}.0.bias"] = rng.randn(256).astype(np.float32) * 0.1
        _bn_entries(sd, f"{q}.2", 256, rng)
        sd[f"{q}.4.weight"] = rng.randn(256, 256, 3).astype(np.float32) * 0.1
        sd[f"{q}.4.bias"] = rng.randn(256).astype(np.float32) * 0.1
        _bn_entries(sd, f"{q}.5", 256, rng)

        r = f"{side}_mano_regressor"
        _msg_entries(sd, f"{r}.sa1", 4, [[128, 128, 256], [128, 196, 256]], rng)
        _sa_entries(sd, f"{r}.sa2", 515, [256, 512], rng)
        sd[f"{r}.mano_regressor.0.weight"] = rng.randn(1024, 512).astype(np.float32) * 0.05
        sd[f"{r}.mano_regressor.0.bias"] = rng.randn(1024).astype(np.float32) * 0.05
        _bn_entries(sd, f"{r}.mano_regressor.2", 1024, rng)
        sd[f"{r}.mano_regressor.4.weight"] = rng.randn(22, 1024).astype(np.float32) * 0.05
        sd[f"{r}.mano_regressor.4.bias"] = rng.randn(22).astype(np.float32) * 0.05

    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


@pytest.fixture(scope="module")
def template():
    net = TEHNet(cfg=ModelConfig(n_points=128, fps_deterministic=True))
    x = jnp.zeros((1, 128, 5))
    return net, net.init({"params": jax.random.PRNGKey(0)}, x, train=False)


def test_conversion_covers_template(rng, template):
    _, variables = template
    sd = build_reference_state_dict(rng)
    converted = torch_to_flax(sd)
    verify_against_template(converted, variables)  # raises on mismatch


def test_roundtrip_exact(rng):
    sd = build_reference_state_dict(rng)
    back = flax_to_torch(torch_to_flax(sd))
    sd_clean = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    assert set(back) == set(sd_clean)
    for k in sd_clean:
        np.testing.assert_array_equal(back[k], sd_clean[k], err_msg=k)


def test_pth_file_ingestion(rng, tmp_path, template):
    net, variables = template
    sd = build_reference_state_dict(rng, prefix="module.")  # DataParallel-style
    blob = {
        "start_it": 1234,
        "state_dict": {k: torch.from_numpy(v.copy()) if isinstance(v, np.ndarray) else v
                       for k, v in sd.items()},
        "max_eval_score": 0.5,
    }
    path = str(tmp_path / "ckpt.pth")
    torch.save(blob, path)
    converted = load_pth_checkpoint(path, variables)
    w = converted["params"]["sa1"]["conv_0_0"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(w), sd["module.sa1.conv_blocks.0.0.weight"][:, :, 0, 0].T
    )


def test_classifier_head_numerical_parity(rng, template):
    """Converted classifier weights must reproduce torch's
    Conv1d-ReLU-BN-Dropout-Conv1d eval forward exactly."""
    net, variables = template
    sd = build_reference_state_dict(rng)
    converted = torch_to_flax(sd)

    x = rng.randn(2, 256, 64).astype(np.float32)  # torch layout [B, C, N]

    tc = torch.nn.Sequential(
        torch.nn.Conv1d(256, 256, 1),
        torch.nn.ReLU(),
        torch.nn.BatchNorm1d(256),
        torch.nn.Dropout(0.3),
        torch.nn.Conv1d(256, 4, 1),
    )
    with torch.no_grad():
        tc[0].weight.copy_(torch.from_numpy(sd["classifier.0.weight"]))
        tc[0].bias.copy_(torch.from_numpy(sd["classifier.0.bias"]))
        tc[2].weight.copy_(torch.from_numpy(sd["classifier.2.weight"]))
        tc[2].bias.copy_(torch.from_numpy(sd["classifier.2.bias"]))
        tc[2].running_mean.copy_(torch.from_numpy(sd["classifier.2.running_mean"]))
        tc[2].running_var.copy_(torch.from_numpy(sd["classifier.2.running_var"]))
        tc[4].weight.copy_(torch.from_numpy(sd["classifier.4.weight"]))
        tc[4].bias.copy_(torch.from_numpy(sd["classifier.4.bias"]))
    tc.eval()
    with torch.no_grad():
        ref = tc(torch.from_numpy(x)).numpy().transpose(0, 2, 1)  # -> [B, N, 4]

    # flax path: Dense/BN on channels-last
    from flax import linen as nn

    class Head(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.Dense(256, name="classifier_conv_0")(h)
            h = nn.relu(h)
            h = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                             name="classifier_bn")(h)
            return nn.Dense(4, name="classifier_conv_1")(h)

    sub_vars = {
        "params": {k: converted["params"][k] for k in
                   ("classifier_conv_0", "classifier_bn", "classifier_conv_1")},
        "batch_stats": {"classifier_bn": converted["batch_stats"]["classifier_bn"]},
    }
    got = np.asarray(Head().apply(sub_vars, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_query_conv_numerical_parity(rng, template):
    """k=3 conv head parity incl. SAME padding behavior."""
    sd = build_reference_state_dict(rng)
    converted = torch_to_flax(sd)
    x = rng.randn(2, 256, 32).astype(np.float32)

    tq = torch.nn.Sequential(
        torch.nn.Conv1d(256, 256, 3, 1, 1),
        torch.nn.ReLU(),
        torch.nn.BatchNorm1d(256),
        torch.nn.Dropout(0.1),
        torch.nn.Conv1d(256, 256, 3, 1, 1),
        torch.nn.BatchNorm1d(256),
    )
    q = "left_query_conv"
    with torch.no_grad():
        for slot, is_bn in (("0", False), ("2", True), ("4", False), ("5", True)):
            mod = tq[int(slot)]
            mod.weight.copy_(torch.from_numpy(sd[f"{q}.{slot}.weight"]))
            mod.bias.copy_(torch.from_numpy(sd[f"{q}.{slot}.bias"]))
            if is_bn:
                mod.running_mean.copy_(torch.from_numpy(sd[f"{q}.{slot}.running_mean"]))
                mod.running_var.copy_(torch.from_numpy(sd[f"{q}.{slot}.running_var"]))
    tq.eval()
    with torch.no_grad():
        ref = tq(torch.from_numpy(x)).numpy().transpose(0, 2, 1)

    from ev2hands_tpu.model.layers import QueryConv

    sub_vars = {
        "params": converted["params"][q],
        "batch_stats": converted["batch_stats"][q],
    }
    got = np.asarray(
        QueryConv().apply(sub_vars, jnp.asarray(x.transpose(0, 2, 1)), train=False)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_regressor_mlp_numerical_parity(rng):
    sd = build_reference_state_dict(rng)
    converted = torch_to_flax(sd)
    x = rng.randn(4, 512).astype(np.float32)

    tm = torch.nn.Sequential(
        torch.nn.Linear(512, 1024),
        torch.nn.ReLU(),
        torch.nn.BatchNorm1d(1024),
        torch.nn.Dropout(0.3),
        torch.nn.Linear(1024, 22),
    )
    r = "left_mano_regressor.mano_regressor"
    with torch.no_grad():
        tm[0].weight.copy_(torch.from_numpy(sd[f"{r}.0.weight"]))
        tm[0].bias.copy_(torch.from_numpy(sd[f"{r}.0.bias"]))
        tm[2].weight.copy_(torch.from_numpy(sd[f"{r}.2.weight"]))
        tm[2].bias.copy_(torch.from_numpy(sd[f"{r}.2.bias"]))
        tm[2].running_mean.copy_(torch.from_numpy(sd[f"{r}.2.running_mean"]))
        tm[2].running_var.copy_(torch.from_numpy(sd[f"{r}.2.running_var"]))
        tm[4].weight.copy_(torch.from_numpy(sd[f"{r}.4.weight"]))
        tm[4].bias.copy_(torch.from_numpy(sd[f"{r}.4.bias"]))
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    from flax import linen as nn

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.Dense(1024, name="fc_0")(h)
            h = nn.relu(h)
            h = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                             name="bn")(h)
            return nn.Dense(22, name="fc_1")(h)

    p = converted["params"]["left_mano_regressor"]
    bs = converted["batch_stats"]["left_mano_regressor"]
    sub_vars = {
        "params": {k: p[k] for k in ("fc_0", "bn", "fc_1")},
        "batch_stats": {"bn": bs["bn"]},
    }
    got = np.asarray(MLP().apply(sub_vars, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_sa_conv_bn_block_numerical_parity(rng):
    """Conv2d-1x1 + BN2d stack over grouped points [B, C, K, S] matches the
    channels-last Dense + BN path."""
    sd = build_reference_state_dict(rng)
    converted = torch_to_flax(sd)
    B, K, S = 2, 8, 6
    x = rng.randn(B, 8, K, S).astype(np.float32)  # torch [B, C=5+3, K, S]

    convs, bns = [], []
    last = 8
    for j, w in enumerate([32, 32, 64]):
        c = torch.nn.Conv2d(last, w, 1)
        b = torch.nn.BatchNorm2d(w)
        with torch.no_grad():
            c.weight.copy_(torch.from_numpy(sd[f"sa1.conv_blocks.0.{j}.weight"]))
            c.bias.copy_(torch.from_numpy(sd[f"sa1.conv_blocks.0.{j}.bias"]))
            b.weight.copy_(torch.from_numpy(sd[f"sa1.bn_blocks.0.{j}.weight"]))
            b.bias.copy_(torch.from_numpy(sd[f"sa1.bn_blocks.0.{j}.bias"]))
            b.running_mean.copy_(torch.from_numpy(sd[f"sa1.bn_blocks.0.{j}.running_mean"]))
            b.running_var.copy_(torch.from_numpy(sd[f"sa1.bn_blocks.0.{j}.running_var"]))
        c.eval(); b.eval()
        convs.append(c); bns.append(b)
        last = w

    with torch.no_grad():
        t = torch.from_numpy(x)
        for c, b in zip(convs, bns):
            t = torch.relu(b(c(t)))
        ref = t.numpy().transpose(0, 3, 2, 1)  # -> [B, S, K, C]

    from flax import linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, h):
            for j, w in enumerate([32, 32, 64]):
                h = nn.Dense(w, name=f"conv_0_{j}")(h)
                h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, name=f"bn_0_{j}")(h)
                h = nn.relu(h)
            return h

    keep = [f"conv_0_{j}" for j in range(3)] + [f"bn_0_{j}" for j in range(3)]
    sub_vars = {
        "params": {k: converted["params"]["sa1"][k] for k in keep if k in converted["params"]["sa1"]},
        "batch_stats": {k: converted["batch_stats"]["sa1"][k] for k in keep
                        if k in converted["batch_stats"]["sa1"]},
    }
    got = np.asarray(Stack().apply(sub_vars, jnp.asarray(x.transpose(0, 3, 2, 1))))
    np.testing.assert_allclose(got, ref, atol=2e-5)
