"""Multi-host (multi-process) initialization.

The reference's multi-GPU story is one process per GPU over NCCL, launched
by ``torch.distributed.launch`` (train.py:1,128).  The TPU-native analogue
is ``jax.distributed.initialize`` — one process per host, all chips of a pod
slice join a single global mesh over ICI/DCN; the SPMD train step in
dctseg/train/trainer.py then works unchanged because the mesh simply grows
(XLA partitions over all global devices).

On Cloud TPU, initialize() autodetects everything from the metadata server;
elsewhere pass coordinator/num_processes/process_id explicitly (or set the
standard env vars).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger("dctseg")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the global multi-host runtime (no-op for single-process runs
    unless coordination info is provided or discoverable)."""
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if explicit or num_processes is not None:
        # `is not None` (not truthiness): process 0 passing --process-id 0
        # must not fall through to a stale JAX_PROCESS_ID in the env
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("JAX_COORDINATOR"),
            num_processes=(num_processes if num_processes is not None
                           else int(os.environ.get("JAX_NUM_PROCESSES",
                                                   "1"))),
            process_id=(process_id if process_id is not None
                        else int(os.environ.get("JAX_PROCESS_ID", "0"))))
        logger.info("jax.distributed initialized: process %d/%d, "
                    "%d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
        # Establish the cross-process collective context (Gloo on CPU, the
        # ICI/DCN clique on TPU) NOW, while every process is still in
        # lockstep from the coordinator rendezvous above: context setup has
        # a short peer deadline (observed 30 s for Gloo key exchange), and
        # the first *training* collective can otherwise be skewed by
        # minutes of per-process cold compiles.  A trivial global sync
        # compiles in ~1 s, so all processes reach it near-simultaneously.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("dctseg:collective_init")
        logger.info("global collective context established")


def barrier(name: str, timeout_ms: int = 3_600_000) -> None:
    """Rendezvous all processes through the coordination service (NOT a
    device collective — safe to call around compilation, and immune to the
    collective backend's short peer deadlines).  No-op when
    single-process."""
    if jax.process_count() <= 1:
        return
    try:
        # jax exposes no public coordination-service barrier; reach for the
        # internal client but survive its relocation in a jax upgrade by
        # falling back to a device collective (which works, just loses the
        # around-compilation safety this barrier exists for).
        from jax._src import distributed as _jd
        client = _jd.global_state.client
        if client is None:
            return
        client.wait_at_barrier(name, timeout_ms, None)
    except (ImportError, AttributeError):
        logger.warning("coordination-service barrier unavailable in this "
                       "jax version; falling back to a device collective")
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def is_primary() -> bool:
    """The logging/checkpointing gate (the reference's rank == print_rank,
    train.py:113)."""
    return jax.process_index() == 0
