"""Device mesh + sharding helpers: the framework's distributed backbone.

The reference's only parallelism is single-process ``nn.DataParallel``
(``train.py:68``) plus SLURM-array file sharding (SURVEY.md §2.5). Here
distribution is first-class and compiler-driven: a ``jax.sharding.Mesh`` with
a ``data`` axis, batches sharded over it, parameters replicated, and XLA
inserting the gradient all-reduce over ICI inside the single jitted train
step. Multi-host extends the same program via ``jax.distributed.initialize``.

BatchNorm note: under this scheme batch statistics are computed over the
*global* batch (XLA all-reduces the mean/variance reductions), unlike
DataParallel's per-replica stats — strictly better-behaved, documented as a
deviation.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (DCN): no-op for single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def create_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
