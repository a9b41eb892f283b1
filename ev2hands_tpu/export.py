"""AOT serving export: the full inference pipeline as one serialized
StableHLO artifact (``jax.export``).

The reference has no deployment story beyond "run the torch script"
(``src/Ev2Hands/demo.py`` / ``evaluate_ev2hands_r.py`` re-build the model
and re-trace per process). Here the production inference step — device-side
ERPC window transform, TEHNet forward, MANO meshes — exports as a single
fixed-shape StableHLO module with the trained weights baked in as constants,
loadable by any JAX process (or any StableHLO-consuming runtime) without the
model code, flax, or the checkpoint machinery.

Design notes (TPU-first):
  * fixed shapes: batch and window sizes are compile-time constants like
    everywhere else in the framework — serving replicas pick a batch size
    at export time;
  * the artifact pins the *platform list* it was lowered for. Exporting for
    "tpu" from a CPU-only host works (cross-platform lowering) but then
    gates off the Pallas kernels (their ``jax.default_backend() == "tpu"``
    gates run at trace time); export on a TPU host to bake them in;
  * randomness (the ERPC resampler's key) stays an explicit input.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def make_serving_fn(net, hands, cfg, weights: Optional[Dict] = None):
    """The pure serving function.

    ``fn(params, batch_stats, events [B, N, 4] raw (x, y, t_ms, polarity),
    valid [B, N] bool, key) -> outputs`` — or, when ``weights`` is given,
    ``fn(events, valid, key)`` with the weights closed over (they become
    constants of the exported module).

    Outputs: per-event segmentation logits + argmax, both hands' MANO
    parameters, vertices (meters) and 21 joints — everything
    ``evaluate_real.py`` / ``demo.py`` consume.
    """
    from ev2hands_tpu.events.erpc import erpc_real_batch_transform
    from ev2hands_tpu.model import apply_mano

    sensor = cfg.sensor

    def fn(params, batch_stats, events, valid, key):
        erpc = erpc_real_batch_transform(
            events, valid, key,
            width=sensor.width, height=sensor.height,
            n_out=cfg.model.n_points,
        )
        outputs = net.apply(
            {"params": params, "batch_stats": batch_stats},
            erpc.events, train=False,
        )
        outputs = apply_mano(hands, outputs)
        out = {"class_logits": outputs["class_logits"],
               "seg": jnp.argmax(outputs["class_logits"], axis=-1),
               "events": erpc.events}
        for side in ("left", "right"):
            for k in ("global_orient", "hand_pose", "betas", "transl",
                      "vertices", "j3d"):
                out[f"{side}_{k}"] = outputs[side][k]
        return out

    if weights is None:
        return fn
    p, bs = weights["params"], weights["batch_stats"]
    return lambda events, valid, key: fn(p, bs, events, valid, key)


def export_serving(
    net,
    hands,
    cfg,
    weights: Dict,
    batch_size: int,
    max_events: int = 8192,
    platforms: Sequence[str] = ("tpu",),
    data_parallel: int = 0,
    mesh: Optional[object] = None,
    path: Optional[str] = None,
) -> bytes:
    """Serialize the serving function to a StableHLO artifact.

    ``max_events`` is the padded raw-window capacity (the ERPC transform
    resamples to ``cfg.model.n_points``). ``data_parallel=N`` exports a
    multi-chip module: the batch shards over a ``data`` mesh axis, weights
    replicate, and the artifact records the shardings — the loading process
    just needs N devices and sharded inputs (``jax.export`` pins
    ``nr_devices``). ``mesh`` overrides the mesh entirely (any mesh with a
    ``data`` axis — e.g. a (data, event) mesh matching a
    ``TEHNet(event_mesh=...)`` net, the context-parallel serving module for
    windows past one chip's budget). Returns the serialized bytes and
    optionally writes them to ``path``.
    """
    from jax import export as jex

    fn = make_serving_fn(net, hands, cfg, weights=weights)

    # typed PRNG keys don't serialize as module inputs; the exported module
    # takes a plain uint32[2] seed (the raw threefry key data)
    def serve(events, valid, key_data):
        return fn(events, valid, jax.random.wrap_key_data(key_data))

    ev_spec = ((batch_size, max_events, 4), jnp.float32)
    va_spec = ((batch_size, max_events), jnp.bool_)
    key_spec = ((2,), jnp.uint32)
    if mesh is None and data_parallel:
        import numpy as np
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:data_parallel]), ("data",))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        assert batch_size % mesh.shape["data"] == 0, (batch_size, mesh.shape)
        bsh = NamedSharding(mesh, PartitionSpec("data"))
        rep = NamedSharding(mesh, PartitionSpec())
        jitted = jax.jit(serve, in_shardings=(bsh, bsh, rep))
        specs = (
            jax.ShapeDtypeStruct(*ev_spec, sharding=bsh),
            jax.ShapeDtypeStruct(*va_spec, sharding=bsh),
            jax.ShapeDtypeStruct(*key_spec, sharding=rep),
        )
    else:
        jitted = jax.jit(serve)
        specs = (
            jax.ShapeDtypeStruct(*ev_spec),
            jax.ShapeDtypeStruct(*va_spec),
            jax.ShapeDtypeStruct(*key_spec),
        )

    exp = jex.export(jitted, platforms=list(platforms))(*specs)
    data = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_serving(path_or_bytes):
    """Deserialize an exported artifact -> callable
    ``(events, valid, key_data uint32[2]) -> outputs dict``."""
    from jax import export as jex

    data = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else open(path_or_bytes, "rb").read()
    )
    exp = jex.deserialize(bytearray(data))
    return exp.call
