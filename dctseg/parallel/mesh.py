"""Device-mesh and sharding helpers.

The reference parallelizes with one process per GPU over NCCL
(``train.py:128-134``) plus an explicit loss all-reduce divided by a
hard-coded world size of 4 (``utils/tools.py:37-41``, ``train.py:165``).
TPU-native equivalent: a single-program ``data`` mesh; batches are sharded
over it and parameters replicated, and XLA inserts the gradient all-reduce
(riding ICI) during jit partitioning — no explicit collectives, no barrier
(``train.py:217``) needed under SPMD.  Multi-host extends the same mesh over
DCN via ``jax.distributed.initialize`` without code changes.

Beyond reference parity (it has no TP/PP/SP, SURVEY.md §2.9b), the mesh can
add a second ``space`` axis that shards the volume's leading spatial (D)
dimension: GSPMD spatially partitions the 3D convolutions, inserting halo
exchanges over ICI automatically.  That is the idiomatic TPU scaling story
for volumetric segmentation — per-chip activation memory drops by the space
factor, so batches (or volumes) larger than one chip's HBM train/infer
without tiling.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(num_devices: Optional[int] = None,
              devices=None, spatial: int = 1) -> Mesh:
    """1-D data mesh, or a (data, space) 2-D mesh when ``spatial > 1``.

    ``spatial`` consecutive devices form one spatial group (consecutive =
    ICI-adjacent on real slices, so halo exchange rides the fastest links).
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    if spatial <= 1:
        return Mesh(np.asarray(devs), (DATA_AXIS,))
    assert len(devs) % spatial == 0, (
        f"{len(devs)} devices not divisible by spatial={spatial}")
    grid = np.asarray(devs).reshape(len(devs) // spatial, spatial)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def data_size(mesh: Mesh) -> int:
    """Number of data-parallel shards (global batch = per-shard * this)."""
    return mesh.shape[DATA_AXIS]


def spatial_size(mesh: Mesh) -> int:
    return mesh.shape.get(SPACE_AXIS, 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over ``data``; with a 2-D mesh the first spatial (D) axis
    is additionally split over ``space`` (GSPMD handles conv halos)."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place a tuple of host arrays with batch sharding.

    Single-process: plain ``device_put``.  Multi-process (after
    ``dctseg.parallel.distributed.initialize``): each process holds only its
    OWN rows of the global batch (the loader shards by process, the
    ``DistributedSampler`` shape of train.py:163), and
    ``make_array_from_process_local_data`` assembles the global array from
    the per-process locals — the jax.Array analogue of DDP's
    one-process-per-device input split.
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return tuple(jax.device_put(a, s) for a in arrays)
    return tuple(
        jax.make_array_from_process_local_data(s, np.asarray(a))
        for a in arrays)
