"""Backend dispatch for Pallas-vs-XLA compute paths.

The fused Pallas kernels (``ops/igso3_pallas``, ``ops/mmd_pallas``) are the
TPU default for their ops; every caller keeps a pure-XLA formulation as the
CPU/GPU fallback (and for ``DXT_NO_PALLAS=1`` A/B runs).  The decision is
made at trace time from the default backend, so it is jit-static.
"""
from __future__ import annotations

import functools
import os

import jax

__all__ = ["use_pallas_tpu"]


@functools.lru_cache(maxsize=1)
def use_pallas_tpu() -> bool:
    """True when the default backend is a real TPU and Pallas kernels are
    not disabled via the ``DXT_NO_PALLAS`` env var (A/B escape hatch)."""
    if os.environ.get("DXT_NO_PALLAS", "0") not in ("0", ""):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
