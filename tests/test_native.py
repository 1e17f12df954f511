"""Tests for the native C++ threaded batch loader."""
import numpy as np
import pytest

from diffusion_extensions_tpu.data.native import (
    NativeBatchLoader,
    build_native,
    native_available,
)
from diffusion_extensions_tpu.data.shapenet import synthetic_planes


pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


def test_build():
    path = build_native()
    assert path.endswith(".so")


def test_batches_come_from_data():
    data = synthetic_planes(8, points=64, seed=0)
    loader = NativeBatchLoader(
        data, batch=4, samples=16, seed=1, device_put=False
    )
    flat_rows = {tuple(np.round(r, 5)) for shape in data for r in shape}
    for _ in range(5):
        b = next(loader)
        assert b.shape == (4, 16, 3)
        assert b.dtype == np.float32
        # every emitted point is a real data point
        for r in b.reshape(-1, 3)[:8]:
            assert tuple(np.round(r, 5)) in flat_rows
    loader.close()


def test_full_point_passthrough():
    data = synthetic_planes(4, points=32, seed=1)
    loader = NativeBatchLoader(
        data, batch=2, samples=32, seed=2, device_put=False
    )
    b = next(loader)
    # samples == points: whole shapes are copied verbatim
    match = [
        np.allclose(b[i], data[j]) for i in range(2) for j in range(4)
    ]
    assert sum(match) == 2
    loader.close()


def test_distinct_batches_and_throughput():
    data = synthetic_planes(32, points=256, seed=2)
    loader = NativeBatchLoader(
        data, batch=16, samples=128, seed=3, n_threads=2, device_put=False
    )
    a = next(loader)
    b = next(loader)
    assert not np.array_equal(a, b)
    import time

    t0 = time.perf_counter()
    for _ in range(100):
        next(loader)
    dt = time.perf_counter() - t0
    assert dt < 5.0, f"native loader too slow: {dt:.2f}s for 100 batches"
    loader.close()
