"""Device-mesh helpers for ICI-scale data/tensor parallelism.

The reference has zero multi-device support (every Slurm script is
``--gres=gpu:1``; no collectives anywhere — SURVEY §2.7).  The TPU-native
equivalent: a named ``jax.sharding.Mesh`` over the chips, batch sharded on
the ``"dp"`` axis, parameters replicated (or sharded on ``"tp"``), gradients
all-reduced by XLA-inserted ``psum`` over ICI.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "P"]


def make_mesh(
    axes: Sequence[tuple[str, int]] | None = None, devices=None
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on one ``"dp"`` axis.  Pass e.g.
    ``axes=[("dp", 4), ("tp", 2)]`` for a 2-D mesh; sizes must multiply to
    the device count (a -1 size is inferred).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if axes is None:
        axes = [("dp", n)]
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    assert int(np.prod(sizes)) == n, f"mesh {sizes} != {n} devices"
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def data_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
