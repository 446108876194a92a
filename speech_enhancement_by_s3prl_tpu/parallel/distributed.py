"""Multi-host initialization.

The reference has no distributed backend at all (SURVEY.md parallelism
inventory). For multi-host TPU pods the JAX runtime handles process
coordination; this module wraps the one-call setup and exposes the
process-local device topology, so the runner can build a global mesh that
spans hosts (collectives ride ICI within a slice, DCN across slices — all
inserted by GSPMD from the sharding annotations in parallel/mesh.py).
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; no-op (False)
    for single-process runs. Arguments default to the standard JAX env
    variables (JAX_COORDINATOR_ADDRESS etc.) / TPU metadata autodetection."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        env_np = os.environ.get("JAX_NUM_PROCESSES")
        if env_np is None:
            return False
        num_processes = int(env_np)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError):
        # already initialized, or single-host autodetection
        return False


def topology_summary() -> str:
    return (
        f"process {jax.process_index()}/{jax.process_count()} | "
        f"{len(jax.local_devices())} local / {len(jax.devices())} global devices"
    )
