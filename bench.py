"""Headline benchmark: event windows/sec/chip (inference).

Measures this framework's full jitted inference pipeline (device-side ERPC
window transform -> TEHNet forward -> both MANO hands) on the available chip,
and compares against the reference target from BASELINE.md: >10x the
PyTorch-CPU reference's event-windows/sec.

The PyTorch baseline is measured by *running* (not copying) the reference
implementation at /root/reference on this machine's CPU with random weights
and a stub MANO layer (the MANO layer is <1% of the FLOPs in both stacks).
If the reference can't be imported, a previously recorded baseline from
``.bench_baseline.json`` is used.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/s", "vs_baseline": N}
where vs_baseline is (ours / (10 * torch_cpu)) — 1.0 means the 10x target is
exactly met.
"""

import json
import os
import sys
import time

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")
REFERENCE = "/root/reference/src/Ev2Hands"


def measure_ours(batch_size=32, iters=20, n_points=2048):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
    from ev2hands_tpu.model import TEHNet, apply_mano

    cfg = DEFAULT_CONFIG.replace(
        model=DEFAULT_CONFIG.model.__class__(n_points=n_points, fps_deterministic=True)
    )
    net = TEHNet(cfg=cfg.model)
    hands = {s: h.params for s, h in
             create_mano_hands(synthetic_mano_models(0)).items()}
    variables = net.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, n_points, cfg.model.in_channels)),
        train=False,
    )

    def pipeline(variables, raw_events, raw_labels, key):
        erpc = erpc_batch_transform(
            raw_events, raw_labels, key,
            width=cfg.sensor.width, height=cfg.sensor.height, n_out=n_points,
        )
        outputs = net.apply(variables, erpc.events, train=False)
        outputs = apply_mano(hands, outputs)
        return (outputs["class_logits"], outputs["left"]["vertices"],
                outputs["right"]["vertices"])

    # Time with an ON-DEVICE iteration loop (lax.scan) + device_get of a
    # scalar: on the remote-tunnel platform, per-dispatch latency is tens of
    # ms and block_until_ready does not actually wait, so host-looped timing
    # measures the tunnel, not the chip.
    def looped(variables, raw_events, raw_labels, key):
        def body(c, k):
            out = pipeline(variables, raw_events, raw_labels, k)
            return c + out[1].sum(), None

        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, iters))
        return acc

    fn = jax.jit(looped)

    rng = np.random.RandomState(0)
    t = np.sort(rng.randint(0, int(5e6), (batch_size, n_points))).astype(np.float32)
    raw = np.stack([
        rng.randint(0, cfg.sensor.width, (batch_size, n_points)).astype(np.float32),
        rng.randint(0, cfg.sensor.height, (batch_size, n_points)).astype(np.float32),
        t,
        rng.randint(0, 2, (batch_size, n_points)).astype(np.float32),
    ], axis=-1)
    labels = rng.randint(0, 4, (batch_size, n_points)).astype(np.int32)
    raw, labels = jnp.asarray(raw), jnp.asarray(labels)

    jax.device_get(fn(variables, raw, labels, jax.random.PRNGKey(1)))  # compile
    t0 = time.perf_counter()
    jax.device_get(fn(variables, raw, labels, jax.random.PRNGKey(2)))
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def measure_torch_reference(batch_size=8, iters=3, n_points=2048):
    """Run the actual reference TEHNet (from /root/reference) on CPU."""
    import importlib.util
    import types

    import numpy as np
    import torch

    os.environ["ERPC"] = "1"

    pkg = types.ModuleType("refmodel")
    pkg.__path__ = [os.path.join(REFERENCE, "model")]
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
    tehnet_mod = load("TEHNet")

    class StubOutput:
        def __init__(self, b):
            self.vertices = torch.zeros(b, 778, 3)
            self.joints = torch.zeros(b, 21, 3)

    class StubMano:
        shapedirs = torch.zeros(778, 3, 10)
        faces = np.zeros((1538, 3), np.int64)

        def __call__(self, global_orient=None, hand_pose=None, betas=None, transl=None):
            return StubOutput(global_orient.shape[0])

    net = tehnet_mod.TEHNet(n_pose_params=6)
    net.eval()
    hands = {"left": StubMano(), "right": StubMano()}
    x = torch.randn(batch_size, 5, n_points)

    with torch.no_grad():
        net(x, hands)  # warm-up
        t0 = time.perf_counter()
        for _ in range(iters):
            net(x, hands)
        dt = time.perf_counter() - t0
    return batch_size * iters / dt


def get_torch_baseline():
    try:
        wps = measure_torch_reference()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"torch_cpu_windows_per_sec": wps}, f)
        return wps
    except Exception as e:
        print(f"# torch reference baseline failed ({e}); using cache", file=sys.stderr)
        if os.path.exists(BASELINE_CACHE):
            with open(BASELINE_CACHE) as f:
                return json.load(f)["torch_cpu_windows_per_sec"]
        return None


def main():
    ours = measure_ours()
    torch_cpu = get_torch_baseline()
    vs = (ours / (10.0 * torch_cpu)) if torch_cpu else None
    print(json.dumps({
        "metric": "event_windows_per_sec_per_chip_inference",
        "value": round(ours, 2),
        "unit": "windows/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
