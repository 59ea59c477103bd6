"""Device mesh helpers.

The reference is strictly single-GPU (SURVEY.md §2.3); all multi-chip
structure here is new, designed for TPU slices: a 1-D ``data`` mesh axis is
used both for camera data-parallelism and for the Gaussian/tile-sharded
renderer.  Multi-host initialization goes through ``jax.distributed``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def init_distributed(coordinator: str = "", num_processes: int = 1, process_id: int = 0):
    """Multi-host process-group init (replaces NCCL/MPI — none in the
    reference; jax.distributed + ICI collectives instead)."""
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def is_main_process() -> bool:
    """Process-0 guard for file outputs (checkpoints, PLY, logs) so a
    multi-host run writes each artifact exactly once."""
    return jax.process_index() == 0
