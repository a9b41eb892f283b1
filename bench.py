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


def analytic_flops_per_window(n_points=2048, sa1_activity=None):
    """Analytic FLOPs (2 x MACs) of the inference pipeline per event window —
    the XLA ``cost_analysis`` on this platform underreports by more than an
    order of magnitude (and cannot see Pallas kernels), so both MFU lines use
    this count of the dominant matmul terms.

    Channel spec mirrors model/tehnet.py (reference TEHNet.py:127-166).

    Two variants:
      * ``sa1_activity=None`` — the DENSE-formulation count. The sa1 scales
        actually run a block-sparse kernel that skips point tiles with no
        selected neighbor, so part of this count is never executed: this is
        the dense-normalized throughput metric (consistent across bench
        history), not a hardware utilization.
      * ``sa1_activity=(a0, a1, a2)`` — the EXECUTED count: each sa1 scale's
        quadratic pair-conv term is scaled by its measured tile-activity
        fraction (the exact fraction of [sb, nb] tiles the kernel runs —
        read from the same ``tile_activity`` bits that gate the kernel, so
        this is executed work by construction, no trace parsing needed).
    """
    N = n_points

    def msg(S, n, d_in, scales, activity=None):
        macs = 0
        for j, c in enumerate(scales):
            a = 1.0 if activity is None else activity[j]
            macs += n * (d_in + 3) * c[0] + S * (d_in + 3) * c[0]  # u/v split
            macs += a * S * n * (c[0] * c[1] + c[1] * c[2])        # pair convs
        return macs

    macs = 0
    # encoder
    macs += msg(512, N, 5, [(32, 32, 64), (64, 64, 128), (64, 96, 128)],
                activity=sa1_activity)
    macs += msg(128, 512, 320, [(128, 128, 256), (128, 196, 256)])
    macs += 128 * (515 * 256 + 256 * 512 + 512 * 1024)             # sa3
    # decoder (3-NN interp matmuls omitted — small)
    macs += 128 * (1536 * 256 + 256 * 256)                          # fp3
    macs += 512 * (576 * 256 + 256 * 128)                           # fp2
    macs += N * (128 * 128 + 128 * 128 + 128 * 256)                 # fp1
    # heads
    macs += N * (256 * 256 + 256 * 4)                               # classifier
    macs += 2 * N * 2 * 3 * 256 * 256                               # query k=3 convs
    macs += 2 * 2 * N * 4 * 256                                     # attention
    # regressors (both hands)
    reg = msg(128, N, 4, [(128, 128, 256), (128, 196, 256)])
    reg += 128 * (515 * 256 + 256 * 512)                            # sa2 all
    reg += 512 * 1024 + 1024 * 22                                   # MLP
    macs += 2 * reg
    return 2.0 * macs


def measure_ours(batch_size=32, iters=20, n_points=2048, **model_overrides):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
    from ev2hands_tpu.model import TEHNet, apply_mano

    cfg = DEFAULT_CONFIG.replace(
        model=DEFAULT_CONFIG.model.__class__(
            n_points=n_points, fps_deterministic=True, **model_overrides
        )
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
    #
    # The raw events are perturbed per iteration with the scan key: XLA
    # hoists loop-invariant computation out of the scan, so a constant input
    # would let the deterministic ERPC rasterization stage run ONCE instead
    # of per iteration, overstating throughput.
    def looped(variables, raw_events, raw_labels, key):
        def body(c, k):
            # per-iteration polarity flip: keeps pixel geometry valid while
            # making every rasterization operand key-dependent
            flip = jax.random.bernoulli(k, 0.5, (raw_events.shape[0], 1))
            p = raw_events[:, :, 3]
            ev = raw_events.at[:, :, 3].set(jnp.where(flip, 1.0 - p, p))
            out = pipeline(variables, ev, raw_labels, k)
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

    # two warm calls: the first execution of a freshly-loaded program carries
    # a one-time ~40 ms load cost on this platform (see utils/profiling.py)
    jax.device_get(fn(variables, raw, labels, jax.random.PRNGKey(1)))
    jax.device_get(fn(variables, raw, labels, jax.random.PRNGKey(3)))
    t0 = time.perf_counter()
    jax.device_get(fn(variables, raw, labels, jax.random.PRNGKey(2)))
    dt = time.perf_counter() - t0

    # Measured tile activity of the three sa1 sparse-kernel scales on the
    # benchmark inputs: the exact fraction of the dense pair work the
    # production kernel executes (same mask bits that gate the kernel).
    sa1_activity = measure_sa1_activity(
        erpc_batch_transform(
            raw, labels, jax.random.PRNGKey(2),
            width=cfg.sensor.width, height=cfg.sensor.height, n_out=n_points,
        ).events
    )

    # MFU from the analytic matmul count (XLA cost_analysis underreports on
    # this platform and cannot count Pallas kernels). TPU v5 lite peak:
    # ~197 TFLOP/s bf16 (the dot path); MFU against that peak.
    # Two numbers: dense-normalized (bench-history-stable throughput metric)
    # and executed (sa1 pair convs scaled by measured tile activity).
    flops_per_window = analytic_flops_per_window(n_points)
    flops_executed = analytic_flops_per_window(n_points, sa1_activity)
    peak = 197e12
    mfu_pct = 100.0 * (flops_per_window * batch_size * iters / dt) / peak
    mfu_executed_pct = 100.0 * (flops_executed * batch_size * iters / dt) / peak

    return (batch_size * iters / dt, flops_per_window, mfu_pct,
            mfu_executed_pct, sa1_activity)


def measure_sa1_activity(events, npoint=512, nb=256):
    """Mean tile-activity fraction per sa1 scale on a representative ERPC
    batch — computed with the SAME ops the production path runs
    (fps_auto -> dense_selection_mask -> morton permute -> tile_activity),
    so (1 - activity) is exactly the fraction of pair-conv work the sparse
    kernel skips."""
    import jax
    import jax.numpy as jnp

    from ev2hands_tpu.ops.pallas_grouping import (
        dense_selection_mask, morton_perm, permute_columns, tile_activity,
    )
    from ev2hands_tpu.ops.pallas_ops import fps_auto
    from ev2hands_tpu.ops.pointnet import index_points, square_distance

    @jax.jit
    def acts(events):
        xyz = events[..., :3]
        new_xyz = index_points(xyz, fps_auto(xyz, npoint, key=None))
        sq = square_distance(new_xyz, xyz)
        perm = morton_perm(xyz)
        out = []
        for r, k in ((0.1, 32), (0.2, 64), (0.4, 128)):
            sel = dense_selection_mask(xyz, new_xyz, r, k, sqrdists=sq)
            act = tile_activity(permute_columns(sel, perm), nb)
            out.append(jnp.mean(act.astype(jnp.float32)))
        return jnp.stack(out)

    return [round(float(a), 4) for a in jax.device_get(acts(events))]


def measure_train_step(batch_size=8, iters=10, n_points=2048,
                       **model_overrides):
    """Windows/s of the FULL jitted train step (device ERPC + fwd + MANO +
    losses incl. collision + bwd + Adam) — the published number for the
    training path (the inference headline uses the dense eval path)."""
    import jax
    import numpy as np
    import optax

    from __graft_entry__ import _fake_batch
    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.train import (
        build_collision_context,
        create_train_state,
        make_train_step,
    )

    model_overrides.setdefault("fps_deterministic", True)
    cfg = DEFAULT_CONFIG.replace(
        model=DEFAULT_CONFIG.model.__class__(
            n_points=n_points, **model_overrides
        ),
        train=DEFAULT_CONFIG.train.__class__(batch_size=batch_size),
    )
    hands_obj = create_mano_hands(synthetic_mano_models(0))
    hands = {s: h.params for s, h in hands_obj.items()}
    ctx = build_collision_context(hands_obj)
    net = TEHNet(cfg=cfg.model)
    optimizer = optax.adam(cfg.train.learning_rate)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), optimizer)
    step = make_train_step(net, hands, ctx, cfg, optimizer, augment=True)

    batch = {k: jax.numpy.asarray(v) if not isinstance(v, dict)
             else {kk: jax.numpy.asarray(vv) for kk, vv in v.items()}
             for k, v in _fake_batch(cfg, batch_size, np.random.RandomState(0)).items()}

    def looped(state, key):
        def body(s, k):
            # key-perturb the raw events so the deterministic rasterization
            # stage cannot be hoisted out of the scan (see measure_ours)
            flip = jax.random.bernoulli(k, 0.5, (batch["events"].shape[0], 1))
            p = batch["events"][:, :, 3]
            b = dict(batch, events=batch["events"].at[:, :, 3].set(
                jax.numpy.where(flip, 1.0 - p, p)))
            s2, losses = step(s, b, k)
            return s2, losses["loss"]

        _, losses = jax.lax.scan(body, state, jax.random.split(key, iters))
        return losses[-1]

    fn = jax.jit(looped)
    jax.device_get(fn(state, jax.random.PRNGKey(1)))  # compile
    jax.device_get(fn(state, jax.random.PRNGKey(3)))  # warm the loaded program
    t0 = time.perf_counter()
    jax.device_get(fn(state, jax.random.PRNGKey(2)))
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
    cached = None
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)["torch_cpu_windows_per_sec"]
    try:
        wps = measure_torch_reference()
        # Keep the BEST torch throughput observed on this host: the 1-core
        # box is sometimes contended, and a depressed reference reading
        # would flatter vs_baseline. Taking the max is conservative
        # against us (idle-host measurement: 0.96 w/s).
        if cached is not None:
            wps = max(wps, cached)
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"torch_cpu_windows_per_sec": wps}, f)
        return wps
    except Exception as e:
        print(f"# torch reference baseline failed ({e}); using cache", file=sys.stderr)
        return cached


def wait_for_tpu(max_wait_s=1800, probe_timeout_s=120):
    """Block until the TPU backend answers a tiny jit (subprocess probes —
    an in-process init failure is cached by jax.xla_bridge, so the probe
    must run outside). The axon tunnel has transient outage phases where
    backend init raises UNAVAILABLE or hangs (documented in CLAUDE.md);
    without this, a driver-run bench landing in such a phase records
    nothing for the round."""
    import subprocess

    deadline = time.time() + max_wait_s
    probe = ("import jax, jax.numpy as jnp; "
             "print(jax.jit(lambda a: a + 1)(jnp.ones((8, 8))).sum())")
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c", probe], check=True,
                timeout=probe_timeout_s, capture_output=True,
            )
            return True
        except Exception as e:
            if time.time() > deadline:
                print(f"# TPU backend still unavailable after "
                      f"{max_wait_s}s: {e}", file=sys.stderr)
                return False
            print("# TPU backend unavailable; retrying in 60 s",
                  file=sys.stderr)
            time.sleep(60)


def main():
    wait_for_tpu()
    # Headline batch: B=16, the measured serving sweet spot — the batch
    # sweep (scripts/ab_infer_batch.py, artifacts/ab_infer_batch.json) shows
    # the pipeline does NOT amortize past 16 (B=16 398.6/401.9 w/s vs B=32
    # 382.3/383.2, B=64 387.5/389.3, B=128 378.9/379.7). Serving batch is a
    # free knob, so the headline publishes the best measured configuration;
    # the B=32 production-eval-batch number (the bench-history metric
    # through round 3) is kept as a secondary field below.
    (ours, flops_per_window, mfu_pct, mfu_executed_pct,
     sa1_activity) = measure_ours(batch_size=16)
    try:
        ours_b32, _, _, _, _ = measure_ours(batch_size=32)
    except Exception as e:
        print(f"# B=32 secondary inference bench failed: {e}", file=sys.stderr)
        ours_b32 = None
    try:
        train_wps = measure_train_step()
    except Exception as e:
        print(f"# train-step bench failed: {e}", file=sys.stderr)
        train_wps = None
    # mixed-precision training (ModelConfig.bf16_train, opt-in documented
    # deviation — reference parity keeps the f32 line as THE train number;
    # measured +18% on v5e, scripts/ab_bf16.py)
    try:
        train_bf16_wps = measure_train_step(bf16_train=True)
    except Exception as e:
        print(f"# bf16 train-step bench failed: {e}", file=sys.stderr)
        train_bf16_wps = None
    torch_cpu = get_torch_baseline()
    vs = (ours / (10.0 * torch_cpu)) if torch_cpu else None
    print(json.dumps({
        "metric": "event_windows_per_sec_per_chip_inference",
        "value": round(ours, 2),
        "unit": "windows/s",
        # measurement configuration of the headline value, machine-readable
        # (the headline moved B=32 -> B=16 in round 4; trackers keying on
        # the metric name alone should read this field)
        "batch": 16,
        "n_points": 2048,
        "vs_baseline": round(vs, 3) if vs is not None else None,
        # the through-round-3 headline configuration (production eval batch),
        # kept for bench-history comparability
        "eval_b32_windows_per_sec": (
            round(ours_b32, 2) if ours_b32 is not None else None
        ),
        "train_step_windows_per_sec": (
            round(train_wps, 2) if train_wps is not None else None
        ),
        "train_step_bf16_windows_per_sec": (
            round(train_bf16_wps, 2) if train_bf16_wps is not None else None
        ),
        "flops_per_window": (
            round(flops_per_window) if flops_per_window is not None else None
        ),
        "mfu_pct": round(mfu_pct, 3) if mfu_pct is not None else None,
        # executed-work MFU: sa1 pair convs scaled by the measured
        # tile-activity fraction the sparse kernel actually runs
        "mfu_executed_pct": round(mfu_executed_pct, 3),
        "sa1_tile_activity": sa1_activity,
    }))


if __name__ == "__main__":
    main()
