"""Test harness: force an 8-device virtual CPU mesh before jax backend init.

The image's sitecustomize registers the axon TPU backend and sets
``jax_platforms="axon,cpu"``; tests must run on CPU with 8 virtual devices
so multi-chip sharding can be exercised without hardware.
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def golden_path(name: str) -> str:
    return os.path.join(GOLDENS, name)


def require_golden(name: str):
    import numpy as np

    path = golden_path(name)
    if not os.path.exists(path):
        pytest.skip(f"golden file {name} not generated (run tools/make_goldens.py)")
    return np.load(path)


def spec_str(x):
    """Stringified PartitionSpec of an array's sharding (NOT str(sharding),
    which embeds every mesh axis name and makes substring checks vacuous)."""
    s = getattr(x, "sharding", None)
    return str(getattr(s, "spec", s))
