"""Synthetic datasets for the toy experiments — all on-device jnp, no host
loops.

* two-mode rotations: +-90 deg about z (reference ``so3_train.py:65-68``)
* geodesic lock segment: so3_lerp between R(0, pi/3, 0) and R(0, 2pi/3, 0)
  (reference ``so3_lock_train.py:76-81`` / ``euler_lock_train.py:67-71``)
* Bingham covariance presets sur/scr/lcr/lur (reference
  ``bingham_train.py:54-78``)
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.igso3 import Bingham
from ..ops.so3 import euler_to_rmat, so3_lerp

__all__ = [
    "two_mode_rotations",
    "sample_two_mode_batch",
    "lock_segment_endpoints",
    "sample_lock_batch",
    "BINGHAM_COVS",
    "bingham_dist",
]


def two_mode_rotations(dtype=jnp.float32) -> jax.Array:
    """The two target modes: +-90 deg rotations about z
    (``so3_train.py:65-68``)."""
    z90 = jnp.asarray(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=dtype
    )
    return jnp.stack((z90, z90.T), axis=0)


def sample_two_mode_batch(key: jax.Array, batch: int) -> jax.Array:
    rotations = two_mode_rotations()
    idx = jax.random.randint(key, (batch,), 0, 2)
    return rotations[idx]


def lock_segment_endpoints(dtype=jnp.float32):
    """R(0, pi/3, 0) and R(0, 2pi/3, 0) (``so3_lock_train.py:76-77``)."""
    zero = jnp.zeros((), dtype)
    r1 = euler_to_rmat(zero, jnp.asarray(math.pi / 3, dtype), zero)[None]
    r2 = euler_to_rmat(zero, jnp.asarray(2 * math.pi / 3, dtype), zero)[None]
    return r1, r2


def sample_lock_batch(key: jax.Array, batch: int) -> jax.Array:
    """Uniform samples along the geodesic segment
    (``so3_lock_train.py:79-81``)."""
    r1, r2 = lock_segment_endpoints()
    weight = jax.random.uniform(key, (batch, 1))
    return so3_lerp(r1, r2, weight)


# reference: bingham_train.py:54-78
BINGHAM_COVS: dict[str, np.ndarray] = {
    "sur": np.diag([1000.0, 0.1, 0.1, 0.1]).astype(np.float32),
    "scr": np.array(
        [
            [1e05, 0.00, 0.00, 0.00],
            [0.00, 1.00, 0.99, 0.99],
            [0.00, 0.99, 1.00, 0.99],
            [0.00, 0.99, 0.99, 1.00],
        ],
        dtype=np.float32,
    ),
    "lcr": np.array(
        [
            [1.00, 0.00, 0.00, 0.00],
            [0.00, 1.00, 0.90, 0.90],
            [0.00, 0.90, 1.00, 0.90],
            [0.00, 0.90, 0.90, 1.00],
        ],
        dtype=np.float32,
    ),
    "lur": np.eye(4, dtype=np.float32),
}

BINGHAM_TITLES = {
    "sur": "Small Uncorrelated Rotations",
    "scr": "Small Correlated Rotations",
    "lcr": "Large Correlated Rotations",
    "lur": "Large Uncorrelated Rotations",
}


def bingham_dist(acro: str) -> Bingham:
    return Bingham.create(jnp.asarray(BINGHAM_COVS[acro]))
