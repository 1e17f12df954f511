"""Fused Pallas TPU kernel for rotation-kernel block sums (MMD).

The Bingham eval computes sum_{n,m} exp(-sqrt(2) theta(X_n, Y_m)) over
20k x 20k rotation pairs (``bingham_test.py:29``).  The XLA path
(``metrics.pairwise_rotation_angle``) needs four (N, M) matmul outputs plus
elementwise passes — ~4 x N*M floats of HBM traffic per block.  This kernel
computes the four bilinears as MXU dots on VMEM-resident tiles, applies
atan2/exp in-register, and reduces to a single scalar per grid cell — HBM
traffic is just the X/Y tiles (O(N+M)), a >100x traffic reduction at eval
sizes.

Input layout: rotations flattened COLUMN-major per sample, i.e.
``Xc[n, i*3+k] = R_n[k, i]`` (columns contiguous), so the column slices the
bilinears need are contiguous 3-wide strips of the tile.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gaussian_kernel_sum_pallas", "rot_colmajor"]

_PI = math.pi
_BN = 256  # X tile rows
_BM = 256  # Y tile rows


def _atan_poly(z: jax.Array) -> jax.Array:
    """atan(z) for |z| <= 1, 6-term odd minimax polynomial (max abs error
    ~1.5e-6 rad).  Mosaic lowers no inverse-trig primitives."""
    z2 = z * z
    return z * (
        0.99997726
        + z2
        * (
            -0.33262347
            + z2
            * (
                0.19354346
                + z2 * (-0.11643287 + z2 * (0.05265332 + z2 * -0.01172120))
            )
        )
    )


def _atan2_nonneg(s: jax.Array, c: jax.Array) -> jax.Array:
    """atan2(s, c) for s >= 0 (geodesic angle in [0, pi]) via octant
    reduction onto the [0, 1] polynomial."""
    abs_c = jnp.abs(c)
    num = jnp.minimum(s, abs_c)
    den = jnp.maximum(jnp.maximum(s, abs_c), 1e-30)
    a = _atan_poly(num / den)
    a = jnp.where(s > abs_c, 0.5 * _PI - a, a)
    return jnp.where(c < 0, _PI - a, a)


def rot_colmajor(r: jax.Array) -> jax.Array:
    """(N, 3, 3) rotations -> (N, 9) with layout [i*3+k] = R[k, i]
    (column-contiguous)."""
    return jnp.swapaxes(r, -1, -2).reshape(*r.shape[:-2], 9)


def _kernel(nx_ref, ny_ref, x_ref, y_ref, out_ref):
    """One (BN, BM) block: accumulate sum exp(-sqrt(2) theta) into out."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[:]  # (BN, 9) column-major rotations
    y = y_ref[:]  # (BM, 9)

    def col(a, c):
        return a[:, c * 3 : (c + 1) * 3]  # contiguous column c, (B, 3)

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # trace(X^T Y) = <X, Y>_F over all 9 entries
    tra = dot(x, y)
    # skew components of M = X^T Y:  M[a,b] = <X_:a, Y_:b>
    sx = dot(col(x, 2), col(y, 1)) - dot(col(x, 1), col(y, 2))
    sy = dot(col(x, 0), col(y, 2)) - dot(col(x, 2), col(y, 0))
    sz = dot(col(x, 1), col(y, 0)) - dot(col(x, 0), col(y, 1))

    s_angle = 0.5 * jnp.sqrt(sx * sx + sy * sy + sz * sz)
    c_angle = 0.5 * (tra - 1.0)
    theta = _atan2_nonneg(s_angle, c_angle)
    k = jnp.exp(-math.sqrt(2.0) * theta)

    # mask padded rows/cols (zero rotations would contribute exp(-pi*sqrt2))
    n_valid = nx_ref[0]
    m_valid = ny_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (_BN, _BM), 0) + i * _BN
    colm = jax.lax.broadcasted_iota(jnp.int32, (_BN, _BM), 1) + j * _BM
    k = jnp.where((row < n_valid) & (colm < m_valid), k, 0.0)

    # sequential TPU grid: accumulate into the single scalar output
    out_ref[0, 0] += jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gaussian_kernel_sum_pallas(
    x: jax.Array, y: jax.Array, interpret: bool = False
) -> jax.Array:
    """sum_{n,m} rmat_gaussian_kernel(X_n, Y_m) for (N,3,3)/(M,3,3) inputs,
    computed with O(N + M) HBM traffic."""
    n, m = x.shape[0], y.shape[0]
    xc = rot_colmajor(x)
    yc = rot_colmajor(y)
    n_pad = pl.cdiv(n, _BN) * _BN
    m_pad = pl.cdiv(m, _BM) * _BM
    xc = jnp.pad(xc, ((0, n_pad - n), (0, 0)))
    yc = jnp.pad(yc, ((0, m_pad - m), (0, 0)))

    grid = (n_pad // _BN, m_pad // _BM)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BN, 9), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 9), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray([n], jnp.int32),
        jnp.asarray([m], jnp.int32),
        xc,
        yc,
    )
    return out[0, 0]


def mmd_pallas(x: jax.Array, y: jax.Array, interpret: bool = False) -> jax.Array:
    """Biased MMD^2 with the gaussian rotation kernel, fully fused
    (same estimator as ``metrics.mmd``, ``util.py:254-285``)."""
    l_x, l_y = x.shape[0], y.shape[0]
    x_sum = gaussian_kernel_sum_pallas(x, x, interpret=interpret)
    y_sum = gaussian_kernel_sum_pallas(y, y, interpret=interpret)
    xy_sum = gaussian_kernel_sum_pallas(x, y, interpret=interpret)
    return x_sum / l_x**2 + y_sum / l_y**2 - 2.0 * xy_sum / (l_x * l_y)
