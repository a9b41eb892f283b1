"""FULL-MODEL numerical parity against the actual reference implementation.

Imports and *executes* the reference TEHNet from /root/reference (never
copies it), loads the same synthetic weights into both models through
``checkpoint.torch_to_flax``, pins the reference's only nondeterminism
(torch.randint FPS start -> 0, matching our ``fps_deterministic``), and
compares every output head of the two frameworks on the same input.

This validates in one shot: the architecture wiring, the checkpoint mapping,
and the numerical semantics of every op (FPS, ball query, grouping, conv/BN
stacks, feature propagation, attention, regressor MLPs).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference/src/Ev2Hands"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)


def _load_reference_tehnet():
    """Import the reference model modules without triggering its settings
    module (which needs pyrender/EGL)."""
    import importlib.util
    import types

    os.environ["ERPC"] = "1"
    os.environ.pop("MHLNES", None)

    pkg = types.ModuleType("refmodel")
    pkg.__path__ = [os.path.join(REFERENCE, "model")]
    import sys

    sys.modules["refmodel"] = pkg

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"refmodel.{name}", os.path.join(REFERENCE, "model", f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodel.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("pointnet2_utils")
    return load("TEHNet")


class _StubMano:
    """Minimal stand-in for the MANO layer inside the reference's regressor
    (we compare the regressed parameters, not the mesh)."""

    def __init__(self):
        import torch

        self.shapedirs = torch.zeros(778, 3, 10)
        self.faces = np.zeros((1538, 3), np.int64)

    def __call__(self, global_orient=None, hand_pose=None, betas=None, transl=None):
        import torch

        class Out:
            pass

        o = Out()
        o.vertices = torch.zeros(global_orient.shape[0], 778, 3)
        o.joints = torch.zeros(global_orient.shape[0], 21, 3)
        return o


def _run_both(rng, grouping, N, B=2, f64=False):
    """Shared driver: same synthetic weights into both frameworks, one
    forward each, returns (our outputs, reference outputs)."""
    import torch

    from ev2hands_tpu.checkpoint import torch_to_flax
    from ev2hands_tpu.config import ModelConfig
    from ev2hands_tpu.model import TEHNet
    from test_checkpoint import build_reference_state_dict

    tehnet_mod = _load_reference_tehnet()
    sd = build_reference_state_dict(rng)
    ref_net = tehnet_mod.TEHNet(n_pose_params=6)
    ref_net.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
         if not k.endswith("num_batches_tracked")},
        strict=False,
    )
    ref_net.eval()
    if f64:
        ref_net.double()

    x = rng.randn(B, 5, N).astype(np.float64 if f64 else np.float32)

    orig_randint = torch.randint
    orig_default = torch.get_default_dtype()

    def zero_randint(*args, **kwargs):
        return torch.zeros_like(orig_randint(*args, **kwargs))

    torch.randint = zero_randint
    if f64:
        # internal zeros/ones buffers (e.g. the FPS distance accumulator,
        # pointnet2_utils.py:74) must come out f64 too
        torch.set_default_dtype(torch.float64)
    try:
        with torch.no_grad():
            ref_out = ref_net(
                torch.from_numpy(x.copy()),
                {"left": _StubMano(), "right": _StubMano()},
            )
    finally:
        torch.randint = orig_randint
        torch.set_default_dtype(orig_default)

    cfg = ModelConfig(n_points=N, fps_deterministic=True, grouping=grouping)
    net = TEHNet(cfg=cfg)
    converted = torch_to_flax(sd)
    variables = {"params": converted["params"],
                 "batch_stats": converted["batch_stats"]}
    if f64:
        variables = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), variables)
    out = net.apply(variables, jnp.asarray(x.transpose(0, 2, 1)), train=False)
    return out, ref_out


def test_full_model_parity_f64(rng):
    """The f32 test below tolerates 2% relative on the regressor heads,
    argued to be fp32 accumulation noise. This run repeats the comparison in
    float64 end-to-end (both frameworks) at a far tighter tolerance: if the
    2% were hiding a semantic mismatch, it would survive the precision bump;
    rounding noise collapses. Measured max relative deltas in f64 (recorded
    2026-08-19): class_logits ~6e-14 abs, every regressor head < 6e-15
    relative — i.e. the f32 test's 2% tolerance is pure rounding."""
    with jax.enable_x64(True):
        out, ref_out = _run_both(rng, grouping="gather", N=256, f64=True)

        np.testing.assert_allclose(
            np.asarray(out["class_logits"]),
            ref_out["class_logits"].numpy().transpose(0, 2, 1),
            rtol=1e-9, atol=1e-10,
        )
        for side in ("left", "right"):
            for key in ("global_orient", "hand_pose", "betas", "transl"):
                a = np.asarray(out[side][key])
                b = ref_out[side][key].numpy()
                scale = np.abs(b).max() + 1e-12
                rel = np.abs(a - b).max() / scale
                assert rel < 1e-9, (
                    f"{side}/{key} f64 mismatch beyond rounding: {rel:.3e}")


def test_full_model_parity_production_scale(rng):
    """Same comparison once at the production N=2048 (gather mode, f32):
    the reduced-N tests can't rule out a scale-dependent semantic difference
    (ball-query backfill rates, FPS coverage, BN stat magnitudes all change
    with N)."""
    out, ref_out = _run_both(rng, grouping="gather", N=2048)

    np.testing.assert_allclose(
        np.asarray(out["class_logits"]),
        ref_out["class_logits"].numpy().transpose(0, 2, 1),
        atol=5e-3,
    )
    for side in ("left", "right"):
        for key in ("global_orient", "hand_pose", "betas", "transl"):
            a = np.asarray(out[side][key])
            b = ref_out[side][key].numpy()
            scale = np.abs(b).max() + 1e-6
            rel = np.abs(a - b).max() / scale
            assert rel < 0.02, (
                f"{side}/{key} diverges at N=2048: {rel:.4f} of {scale:.2f}")


@pytest.mark.parametrize("grouping", ["gather", "dense"])
def test_full_model_parity_vs_reference(rng, grouping):
    import torch

    from ev2hands_tpu.checkpoint import torch_to_flax
    from ev2hands_tpu.config import ModelConfig
    from ev2hands_tpu.model import TEHNet
    from test_checkpoint import build_reference_state_dict

    N = 256
    tehnet_mod = _load_reference_tehnet()

    # identical weights on both sides; strict load validates our synthetic
    # state_dict layout against the real reference module tree
    sd = build_reference_state_dict(rng)
    ref_net = tehnet_mod.TEHNet(n_pose_params=6)
    missing, unexpected = ref_net.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
         if not k.endswith("num_batches_tracked")},
        strict=False,
    )
    assert not [m for m in missing if "num_batches" not in m], missing
    assert not unexpected, unexpected
    ref_net.eval()

    x = rng.randn(2, 5, N).astype(np.float32)

    # pin the reference's random FPS start to 0 (our deterministic mode)
    orig_randint = torch.randint

    def zero_randint(*args, **kwargs):
        out = orig_randint(*args, **kwargs)
        return torch.zeros_like(out)

    torch.randint = zero_randint
    try:
        with torch.no_grad():
            ref_out = ref_net(
                torch.from_numpy(x.copy()),
                {"left": _StubMano(), "right": _StubMano()},
            )
    finally:
        torch.randint = orig_randint

    cfg = ModelConfig(n_points=N, fps_deterministic=True, grouping=grouping)
    net = TEHNet(cfg=cfg)
    variables = net.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, N, 5)), train=False
    )
    converted = torch_to_flax(sd)
    variables = {"params": converted["params"], "batch_stats": converted["batch_stats"]}
    out = net.apply(variables, jnp.asarray(x.transpose(0, 2, 1)), train=False)

    np.testing.assert_allclose(
        np.asarray(out["class_logits"]),
        ref_out["class_logits"].numpy().transpose(0, 2, 1),
        atol=2e-3,
        err_msg="segmentation logits diverge from the reference",
    )
    # Regressor outputs sit behind ~10 more random-weight layers than the
    # seg head; with the unnormalized synthetic weights (|out| ~ 30) fp32
    # accumulation-order noise reaches ~1% relative. A wiring error produces
    # O(100%) differences; per-op numerics are pinned to 2e-5 in the
    # head-level checkpoint tests.
    for side in ("left", "right"):
        for ours_key, ref_key in (
            ("global_orient", "global_orient"),
            ("hand_pose", "hand_pose"),
            ("betas", "betas"),
            ("transl", "transl"),
        ):
            a = np.asarray(out[side][ours_key])
            b = ref_out[side][ref_key].numpy()
            # noise scales with the tensor's magnitude (matmul chains), so
            # normalize the max error by the tensor's max magnitude
            scale = np.abs(b).max() + 1e-6
            rel = np.abs(a - b).max() / scale
            assert rel < 0.02, (
                f"{side}/{ours_key} diverges from the reference ({grouping}): "
                f"max err {rel:.4f} of scale {scale:.2f}\nours={a}\nref={b}"
            )
