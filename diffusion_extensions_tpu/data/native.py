"""ctypes bindings for the native threaded batch loader
(``native/dataloader.cc``).

Builds the shared library on first use with g++ (no pip/pybind needed) and
caches it next to the source.  ``NativeBatchLoader`` matches the
``BatchLoader`` iteration contract; worker threads assemble batches into a
bounded ring fully overlapping device compute.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

__all__ = ["NativeBatchLoader", "build_native", "native_available"]

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "dataloader.cc")
_LIB = os.path.join(_REPO, "native", "libdxtdata.so")
_HASH = _LIB + ".srchash"
_lock = threading.Lock()
_lib = None


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def build_native(force: bool = False) -> str:
    """Compile the shared library from source; returns its path.

    Staleness is decided by a content hash of ``dataloader.cc`` (not mtime:
    a fresh git checkout gives both files checkout-time mtimes, which would
    silently trust a stale binary).  The ``.so`` is never committed — it is
    always built from source on first use on each machine.
    """
    with _lock:
        digest = _src_hash()
        if not force and os.path.exists(_LIB) and os.path.exists(_HASH):
            with open(_HASH) as f:
                if f.read().strip() == digest:
                    return _LIB
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-o", _LIB, _SRC, "-lpthread",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        with open(_HASH, "w") as f:
            f.write(digest)
        return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    lib = ctypes.CDLL(path)
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [
        ctypes.c_void_p,  # data
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # n, points, dim
        ctypes.c_int64, ctypes.c_int64,  # batch, samples
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64,  # threads, seed, cap
    ]
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeBatchLoader:
    """Infinite iterator of (batch, samples, dim) float32 batches assembled
    by native worker threads.  ``data`` must stay alive for the loader's
    lifetime (we keep a reference)."""

    def __init__(
        self,
        data: np.ndarray,
        batch: int,
        samples: int | None = None,
        seed: int = 0,
        n_threads: int = 2,
        capacity: int = 4,
        device_put: bool = True,
    ):
        lib = _load()
        self._data = np.ascontiguousarray(data, dtype=np.float32)
        n, points, dim = self._data.shape
        self.batch = batch
        self.samples = samples or points
        self.dim = dim
        self.device_put = device_put
        self._out = np.empty((batch, self.samples, dim), dtype=np.float32)
        self._handle = lib.dl_create(
            self._data.ctypes.data_as(ctypes.c_void_p),
            n, points, dim, batch, self.samples,
            n_threads, seed, capacity,
        )
        self._lib = lib

    def __iter__(self):
        return self

    def __next__(self):
        if self._handle is None:
            raise StopIteration("NativeBatchLoader is closed")
        ok = self._lib.dl_next(
            self._handle, self._out.ctypes.data_as(ctypes.c_void_p)
        )
        if not ok:  # loader stopping: output buffer was not written
            raise StopIteration("NativeBatchLoader stopped")
        batch = self._out.copy()
        if self.device_put:
            import jax

            return jax.device_put(batch)
        return batch

    def close(self):
        if self._handle is not None:
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
