"""One full-model TRAINING step at N=8192 events, event-sharded over the
8-virtual-CPU (2 data x 4 event) mesh.

This is the long-context demonstration SURVEY §5 calls for: the quadratic
[S, N] pair work, the FPS scan, and the BatchNorm batch statistics all run
sharded over the event axis (dense_train formulation — exact gather-parity
BN stats), with gradients. Gradient *parity* vs the unsharded path is pinned
by tests/test_event_parallel.py::test_tehnet_event_sharded_train_step (f64,
N=512 where both fit); this script proves the sharded program compiles and
executes at an N that is 4x the production window size.

Writes artifacts/event_train_n8192.json.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.flatten_util  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from ev2hands_tpu.config import ModelConfig
    from ev2hands_tpu.model import TEHNet
    from ev2hands_tpu.parallel.event_parallel import create_event_mesh

    N, B = 8192, 2
    mesh = create_event_mesh(n_event=4, n_data=2)
    cfg = ModelConfig(n_points=N, fps_deterministic=True, grouping="dense",
                      dense_train=True, event_parallel=True,
                      pallas_grouping=False)
    net = TEHNet(cfg=cfg, event_mesh=mesh)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, cfg.in_channels)) * 0.4

    t0 = time.time()
    variables = net.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    t_init = time.time() - t0

    def loss_fn(params):
        out, upd = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True,
            rngs={"dropout": jax.random.PRNGKey(2),
                  "fps": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        return (jnp.sum(out["class_logits"] ** 2)
                + sum(jnp.sum(out[s]["transl"] ** 2)
                      for s in ("left", "right")))

    t0 = time.time()
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    jax.block_until_ready(grads)
    t_step = time.time() - t0

    gnorm = float(jnp.linalg.norm(
        jax.flatten_util.ravel_pytree(grads)[0]))
    result = {
        "n_points": N, "batch": B,
        "mesh": {"data": 2, "event": 4},
        "loss": float(loss), "grad_norm": gnorm,
        "finite": bool(np.isfinite(float(loss)) and np.isfinite(gnorm)),
        "init_sec": round(t_init, 1),
        "compile_plus_step_sec": round(t_step, 1),
        "note": "dense_train event-sharded full-model train step at 4x the "
                "production window size; parity pinned in f64 by "
                "test_tehnet_event_sharded_train_step",
    }
    print(json.dumps(result, indent=2))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "event_train_n8192.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    assert result["finite"]


if __name__ == "__main__":
    main()
