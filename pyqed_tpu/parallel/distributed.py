"""Multi-host (DCN) initialization for multi-controller deployments.

SURVEY.md §5.8: on a TPU pod slice every host runs the same program and
must call ``jax.distributed.initialize`` before any JAX op so the
runtime forms one global device set; in-pod communication then rides
ICI and cross-pod traffic rides DCN, both via XLA collectives. The
reference's only distributed backend is the Fortran QMC's MPI farm
(/root/reference/pyqed/qmc/MC_exchange/permute3d/dissipation/main.f:29
``MPI_INIT``/parent-child messaging) — here the same role is played by
the JAX distributed runtime + GSPMD.

Environment-driven (the idiom every TPU launcher uses):
  PYQED_COORDINATOR  host:port of process 0       (or coordinator_address=)
  PYQED_NUM_PROCS    number of processes          (or num_processes=)
  PYQED_PROC_ID      this process's id            (or process_id=)

On a Cloud TPU VM with no explicit settings, ``initialize()`` falls
back to JAX's own auto-detection (metadata server). Single-process use
is a no-op, so library code can call :func:`ensure_distributed`
unconditionally.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def ensure_distributed(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None,
                       local_device_ids=None) -> bool:
    """Initialize the JAX distributed runtime exactly once.

    Returns True if a multi-process runtime was started (or already
    is), False for plain single-process operation. Safe to call from
    every entry point: a second call is a no-op, and with no
    configuration at all it does nothing.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = (coordinator_address
                           or os.environ.get("PYQED_COORDINATOR"))
    if num_processes is None and "PYQED_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["PYQED_NUM_PROCS"])
    if process_id is None and "PYQED_PROC_ID" in os.environ:
        process_id = int(os.environ["PYQED_PROC_ID"])
    if coordinator_address is None and num_processes is None:
        # nothing configured: single-controller operation
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    return True


def process_info():
    """(process_index, process_count, local_devices, global_devices)."""
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())


def global_mesh(axis_name: str = "data"):
    """One-axis mesh over ALL global devices (every host must call this
    with the same arguments — standard multi-controller SPMD)."""
    import numpy as np
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis_name,))
