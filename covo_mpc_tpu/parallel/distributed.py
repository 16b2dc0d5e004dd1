"""Multi-host runtime bootstrap.

One process per host, chips connected over ICI within a slice and DCN
across slices (SURVEY.md §5 distributed-backend row). Call
`initialize_distributed()` once at startup before any jax op; afterwards
`jax.devices()` spans the whole job, and the mesh helpers in
parallel/mesh.py lay the `samples` axis along ICI-adjacent devices so the
per-solve pmin/psum collectives never touch DCN.

Single-process (one host, N chips) jobs skip this entirely.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """`jax.distributed.initialize` with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, the standard
    multi-host launcher contract). Returns the process id. No-op when the
    job is single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return 0
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return process_id


def device_topology() -> dict:
    """Summary of the visible device topology for logs/metrics."""
    devices = jax.devices()
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(devices),
        "local_devices": len(jax.local_devices()),
        "device_kind": devices[0].device_kind if devices else "none",
    }
