"""Multi-host initialization and cross-host utilities.

The reference's multi-process stack is torch.distributed.launch + NCCL
(SURVEY §2.5). The TPU equivalent is one JAX process per host over ICI/DCN:
``jax.distributed.initialize()`` (coordinator from env), then the ordinary
``Mesh`` spans all hosts' devices and pjit/XLA handle the collectives.

These helpers are no-ops on a single host, so every entry point can call
them unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed() -> bool:
    """Initialize multi-host JAX when coordinator env vars are present
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU-pod auto-detected environment). Returns True if initialized."""
    import jax
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        return True
    return False


def process_index() -> int:
    import jax
    return jax.process_index()


def is_primary() -> bool:
    return process_index() == 0


def shard_manifest(items, rank: Optional[int] = None,
                   world: Optional[int] = None):
    """Per-host manifest shard (the DistributedSampler equivalent for the
    host data pipeline): host i reads items[i::world]."""
    import jax
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    return items[rank::world]
