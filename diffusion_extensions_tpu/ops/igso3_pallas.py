"""Fused Pallas TPU kernels for the IGSO(3) density and score.

The north-star native work item (BASELINE.json): the reference's hot numeric
inner loop — the truncated/resummed heat-kernel series of
``distributions.py:53-72`` — as one fused VPU kernel computing the
float32-safe log-density AND its angle-derivative (score) in a single pass
over VMEM-resident tiles, with the small-sigma / small-angle asymptotic
branches baked in (the same cancellation-free sinh regrouping as
``igso3.igso3_log_density``; see ``ops/igso3.py`` for the math derivation).

The kernel is elementwise, so its win over the XLA fusion is modest on its
own; the point is that it composes: ``igso3_logpdf_score`` is the building
block other kernels (samplers, score-matching losses) call without ever
leaving VMEM.  It is the production TPU path for
``IsotropicGaussianSO3.log_prob`` and ``igso3_score_vec``
(``utils.backend.use_pallas_tpu`` dispatch; ``DXT_NO_PALLAS=1`` selects the
XLA formulation for A/B).

A fused inverse-CDF *sampling* kernel was built in round 1 and removed: its
per-sample (1, 1024) CDF-row blocks violate Mosaic's (8, 128) block rules,
so it never lowered on hardware, and every legal reformulation serialises
samples.  Per-timestep table sampling is instead a quantile-table lookup
(two point gathers + lerp, ``igso3.IGSO3Table.sample_angles``) — gathers
are XLA's job; see BENCHMARKS.md "IGSO(3) sampling".

CPU fallback: ``interpret=True`` under the Pallas interpreter so the same
code path is unit-testable without a TPU.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["igso3_logpdf_score_pallas"]

_PI = math.pi
_BLOCK = (8, 128)
_LANES = _BLOCK[0] * _BLOCK[1]


def _logpdf_score_kernel(t_ref, sig_ref, logf_ref, score_ref):
    """One (8, 128) tile: (angle t, sigma) -> (log f, d/dt log f)."""
    t = t_ref[:]
    sigma = sig_ref[:]
    var = sigma * sigma
    u = _PI / var
    x = u * t

    # wrapped-image terms, cancellation-free (see igso3._wrap_terms).
    # sinh/cosh are not lowered by Mosaic; for the small-x branch (x < 0.5)
    # a degree-7 Taylor series is exact to < 1e-8 relative, and at x >= 0.5
    # the exp difference (e1 - e2)/2 loses at most one bit (e1/e2 >= e).
    e1 = jnp.exp(x - _PI * u)
    e2 = jnp.exp(-x - _PI * u)
    small_x = x < 0.5
    x_s = jnp.where(small_x, x, 0.0)
    x2 = x_s * x_s
    sinh_t = x_s * (1.0 + x2 / 6.0 * (1.0 + x2 / 20.0 * (1.0 + x2 / 42.0)))
    cosh_t = 1.0 + x2 / 2.0 * (1.0 + x2 / 12.0 * (1.0 + x2 / 30.0))
    q = jnp.exp(-_PI * u)
    qs = jnp.where(small_x, q * sinh_t, 0.5 * (e1 - e2))
    qc = jnp.where(small_x, q * cosh_t, 0.5 * (e1 + e2))
    one_m2qc = 1.0 - 2.0 * qc
    a = t * one_m2qc + 4.0 * _PI * qs
    da = one_m2qc - 2.0 * t * u * qs + 4.0 * _PI * u * qc

    # log density: log_c + log(A / (2 sin(t/2))), small-t -> A'(0)
    small_t = t < 1e-6
    t_safe = jnp.where(small_t, 1.0, t)
    ratio = jnp.where(small_t, da, a / (2.0 * jnp.sin(t_safe / 2.0)))
    ref_limit = 1.0 - 2.0 * q + 4.0 * _PI * _PI * q  # reference t==0 patch
    ratio = jnp.where(t == 0.0, ref_limit, ratio)
    log_c = (
        0.5 * math.log(_PI)
        - 1.5 * jnp.log(var)
        + var / 4.0
        - (t * t) / (4.0 * var)
    )
    logf_ref[:] = log_c + jnp.log(jnp.maximum(ratio, 1e-38))

    # score: -t/(2 var) + A'/A - cot(t/2)/2, small-t analytic limit
    small_s = t < 1e-4
    ts = jnp.where(small_s, 1.0, t)
    direct = (
        -t / (2.0 * var)
        + da / jnp.where(small_s, 1.0, a)
        - 0.5 * jnp.cos(ts / 2.0) / jnp.sin(ts / 2.0)  # cot; tan not lowered
    )
    ddA0 = -2.0 * _PI * q / var
    dA0 = 1.0 + 2.0 * q * (2.0 * _PI * _PI / var - 1.0)
    limit = ddA0 / (2.0 * dA0) + t / 12.0 - t / (2.0 * var)
    score_ref[:] = jnp.where(small_s, limit, direct)


@functools.partial(jax.jit, static_argnames=("interpret",))
def igso3_logpdf_score_pallas(
    t: jax.Array, sigma: jax.Array, interpret: bool = False
):
    """Fused (log f(t; sigma), d/dt log f(t; sigma)) for any-shaped inputs.

    ``t`` and ``sigma`` broadcast; computation runs as (8, 128)-tiled VPU
    blocks with the tail padded (padding lanes compute garbage on sigma=1
    and are sliced off).
    """
    t, sigma = jnp.broadcast_arrays(
        jnp.asarray(t, jnp.float32), jnp.asarray(sigma, jnp.float32)
    )
    shape = t.shape
    n = max(t.size, 1)
    rows = pl.cdiv(n, _LANES) * _BLOCK[0]
    pad = rows * _BLOCK[1] - n

    t_p = jnp.pad(t.reshape(-1), (0, pad), constant_values=1.0).reshape(
        rows, _BLOCK[1]
    )
    s_p = jnp.pad(sigma.reshape(-1), (0, pad), constant_values=1.0).reshape(
        rows, _BLOCK[1]
    )

    grid = (rows // _BLOCK[0],)
    spec = pl.BlockSpec(_BLOCK, lambda i: (i, 0), memory_space=pltpu.VMEM)
    logf, score = pl.pallas_call(
        _logpdf_score_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _BLOCK[1]), jnp.float32),
            jax.ShapeDtypeStruct((rows, _BLOCK[1]), jnp.float32),
        ),
        interpret=interpret,
    )(t_p, s_p)
    return (
        logf.reshape(-1)[:n].reshape(shape),
        score.reshape(-1)[:n].reshape(shape),
    )
