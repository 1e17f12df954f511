"""Persistent XLA compilation cache.

Remote-compiled TPU programs in this environment can take minutes for the
larger fwd+bwd graphs; caching compiled executables on disk makes every
run after the first start in seconds.  Call once at process start (the
experiment drivers and bench.py do).
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "dxt_jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("DXT_JAX_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
