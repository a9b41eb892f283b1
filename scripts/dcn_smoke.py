"""Two-process localhost DCN smoke test for the multi-host path.

The framework's multi-host story (`parallel/mesh.initialize_distributed` +
`scripts/slurm_train.sh`) rides `jax.distributed`: every process joins one
coordination service, contributes its local devices to a single global Mesh,
and runs the SAME jitted data-parallel program — XLA places the gradient
all-reduce over ICI within a host and DCN across hosts (SURVEY §2.5).

This script exercises that path without real multi-host hardware: it spawns
TWO local processes, each with 4 virtual CPU devices
(``--xla_force_host_platform_device_count=4``), joins them through a
localhost coordinator into an 8-device global mesh, computes the
data-parallel loss + gradient of the deterministic TEHNet forward on a fixed
batch, and compares against the same computation in ONE process with 8 local
devices. Agreement proves the cross-process mesh, the per-process batch
placement (`make_array_from_single_device_arrays`), and the collective
insertion all work.

Usage:
  python scripts/dcn_smoke.py                 # driver: spawn workers + verify
  python scripts/dcn_smoke.py --process_id K --coordinator HOST:PORT \
      --num_processes 2 --out OUT.json        # worker (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _force_cpu(n_local_devices: int) -> None:
    """Must run before the first jax import (conftest.py's recipe)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local_devices}"
        ).strip()


def compute_loss_and_gradnorm(mesh):
    """Deterministic data-parallel loss + grad norm of the small TEHNet on a
    fixed batch, sharded over ``mesh`` (identical on every process: the model
    init and the batch both come from fixed seeds)."""
    import jax
    import jax.flatten_util
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.losses import mano_losses, total_loss
    from ev2hands_tpu.model import apply_mano
    from ev2hands_tpu.parallel.mesh import replicate

    cfg = ge._small_cfg(n_points=128, batch=8, collision_pairs=8)
    net, hands, ctx, optimizer, state = ge._build(cfg)
    batch = ge._fake_batch(cfg, 8, np.random.RandomState(3))
    key = jax.random.PRNGKey(0)

    sh = NamedSharding(mesh, P("data"))

    def make_global(x):
        # every process holds the FULL deterministic batch; hand each local
        # device exactly the rows the global sharding assigns it
        x = np.asarray(x)
        imap = sh.addressable_devices_indices_map(x.shape)
        arrs = [jax.device_put(x[idx], d) for d, idx in imap.items()]
        return jax.make_array_from_single_device_arrays(x.shape, sh, arrs)

    gbatch = jax.tree.map(make_global, batch)
    params = replicate(state.params, mesh)
    stats = replicate(state.batch_stats, mesh)

    def loss_fn(params, batch_stats, b):
        erpc = erpc_batch_transform(
            b["events"], b["labels"], key,
            width=cfg.sensor.width, height=cfg.sensor.height,
            n_out=cfg.model.n_points, augment=False,
        )
        outputs = net.apply(
            {"params": params, "batch_stats": batch_stats},
            erpc.events, train=False,
        )
        outputs = apply_mano(hands, outputs)
        targets = {"left": b["left"], "right": b["right"],
                   "handedness": b["handedness"], "class_logits": erpc.labels}
        return total_loss(mano_losses(outputs, targets, hands, ctx, cfg.loss))

    def loss_and_norm(params, batch_stats, b):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch_stats, b)
        flat, _ = jax.flatten_util.ravel_pytree(grads)
        return loss, jnp.linalg.norm(flat)

    loss, gnorm = jax.jit(loss_and_norm)(params, stats, gbatch)
    return float(loss), float(gnorm)


def run_worker(args) -> None:
    _force_cpu(args.local_devices)
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from ev2hands_tpu.parallel.mesh import create_mesh, initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    assert len(jax.devices()) == args.num_processes * args.local_devices, (
        jax.devices()
    )
    mesh = create_mesh()  # all global devices, 1-D 'data' axis
    loss, gnorm = compute_loss_and_gradnorm(mesh)
    if args.process_id == 0 and args.out:
        with open(args.out, "w") as f:
            json.dump({"loss": loss, "grad_norm": gnorm,
                       "n_devices": len(jax.devices()),
                       "n_processes": args.num_processes}, f)
    # Explicit cross-process sync BEFORE shutdown: on an oversubscribed host
    # the processes can otherwise reach jax.distributed.shutdown() minutes
    # apart (process 0 also writes the JSON), and the coordination service's
    # shutdown barrier times out, CHECK-failing the early process. After this
    # collective both processes enter shutdown within milliseconds.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dcn_smoke_pre_shutdown")
    jax.distributed.shutdown()


def run_driver(out_path: str | None = None) -> dict:
    # single-process reference FIRST (the driver owns 8 virtual devices)
    _force_cpu(8)
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from ev2hands_tpu.parallel.mesh import create_mesh

    ref_loss, ref_gnorm = compute_loss_and_gradnorm(create_mesh(8))

    # free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coordinator = f"127.0.0.1:{port}"

    out = os.path.join(os.path.dirname(out_path) if out_path else "/tmp",
                       "dcn_worker0.json")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process_id", str(pid), "--num_processes", "2",
             "--coordinator", coordinator, "--local_devices", "4",
             "--out", out if pid == 0 else ""],
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    for p in procs:
        rc = p.wait(timeout=1200)
        assert rc == 0, f"worker exited with {rc}"

    with open(out) as f:
        dist = json.load(f)

    rel_loss = abs(dist["loss"] - ref_loss) / (abs(ref_loss) + 1e-12)
    rel_gnorm = abs(dist["grad_norm"] - ref_gnorm) / (abs(ref_gnorm) + 1e-12)
    result = {
        "distributed": dist,
        "single_process": {"loss": ref_loss, "grad_norm": ref_gnorm},
        "rel_loss_diff": rel_loss,
        "rel_gradnorm_diff": rel_gnorm,
        "ok": bool(rel_loss < 1e-5 and rel_gnorm < 1e-4),
    }
    print(json.dumps(result, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    assert result["ok"], result
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.process_id is None:
        run_driver(args.out or None)
    else:
        run_worker(args)


if __name__ == "__main__":
    main()
