"""Multi-host launch helper: one-process-per-host jax.distributed init.

The reference's launch layer is sbatch scripts pinning one GPU
(``slurm-scripts/*.sh``; SURVEY §5.8).  The TPU-native equivalent for
multi-host pods: every host runs the same driver, calls
``maybe_initialize_distributed()`` first, and builds its mesh over
``jax.devices()`` (global across hosts after init).  Single-host runs are a
no-op, so drivers can call this unconditionally.

Environment contract (standard jax.distributed):
  DXT_COORDINATOR   host:port of process 0 (or JAX_COORDINATOR_ADDRESS)
  DXT_NUM_PROCESSES total process count     (or JAX_NUM_PROCESSES)
  DXT_PROCESS_ID    this process's index    (or JAX_PROCESS_ID)
On TPU pods these are usually auto-detected and initialize() needs no args.
"""
from __future__ import annotations

import os

__all__ = ["maybe_initialize_distributed"]


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Returns True if distributed init ran.  Safe to call on single host
    (returns False) and idempotent within a process.
    """
    import jax

    coord = os.environ.get("DXT_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    nproc = os.environ.get("DXT_NUM_PROCESSES") or os.environ.get(
        "JAX_NUM_PROCESSES"
    )
    pid = os.environ.get("DXT_PROCESS_ID") or os.environ.get("JAX_PROCESS_ID")
    auto = os.environ.get("DXT_DISTRIBUTED_AUTO") == "1"

    if not (coord or auto):
        return False
    try:
        if auto:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
            )
    except RuntimeError as e:
        if "already initialized" in str(e):
            return True
        raise
    if verbose:
        print(
            f"jax.distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    return True
