"""Device-mesh and sharding helpers.

The reference parallelizes with one process per GPU over NCCL
(``train.py:128-134``) plus an explicit loss all-reduce divided by a
hard-coded world size of 4 (``utils/tools.py:37-41``, ``train.py:165``).
TPU-native equivalent: a single-program 1-D ``data`` mesh; batches are
sharded over it and parameters replicated, and XLA inserts the gradient
all-reduce (riding ICI) during jit partitioning — no explicit collectives,
no barrier (``train.py:217``) needed under SPMD.  Multi-host extends the same
mesh over DCN via ``jax.distributed.initialize`` without code changes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """device_put a tuple of host arrays with batch sharding."""
    s = batch_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)
