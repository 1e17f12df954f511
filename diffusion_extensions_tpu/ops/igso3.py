"""Isotropic Gaussian on SO(3): density, score, and table-based sampling.

TPU-first re-design of the reference ``IsotropicGaussianSO3``
(``/root/reference/distributions.py:8-81``).  The reference rebuilds a
1000-point trapezoid inverse-CDF table from a float64 series *inside every
training and sampling step* (``diffusion.py:350,404,507,325,482``) — its
dominant non-model cost.  Here:

* the closed-form resummed heat-kernel density is evaluated in **log space**
  (``igso3_log_density``), float32-safe for all sigma: the dangerous
  ``sigma^-3 * exp(-(t/2)^2/sigma^2)`` product and the wrapped-Gaussian
  correction terms become bounded additions of exponents, so no float64, no
  inf/nan scrubbing, and finite log-probs where the reference's float32
  density underflows to 0 (-> -inf log_prob).
* inverse-CDF tables are built **once** per set of noise levels — in a
  diffusion process there are exactly ``T`` distinct eps values, so the whole
  sampling apparatus is a (T, 999) device array indexed by timestep; sampling
  inside jit is a gather + compare-reduce + lerp (``IGSO3Table.sample``).
* ``igso3_series_np`` reproduces the reference's float64-then-cast density
  bit-for-bit (including its underflow-to-zero and t==0 limit patch) for
  golden tests and host-side table builds.

Density (eps == sigma in the reference's notation; ``var = sigma**2``):

    f(t) = sqrt(pi) * var^(-3/2) * e^(var/4) * e^(-(t/2)^2/var)
           * A(t) / (2 sin(t/2)),
    A(t) = t - (t-2pi) e^((pi t - pi^2)/var) - (t+2pi) e^(-(pi t + pi^2)/var)

which is the sum over the two nearest wrapped images of the R^3 Gaussian
heat-kernel expansion (reference: ``distributions.py:56-60``).
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .so3 import MM, exp_skewvec, rmat_to_aa, rmul, rotation_angle
from .se3 import AffineT

__all__ = [
    "igso3_series_np",
    "igso3_log_density",
    "igso3_density",
    "igso3_score_angle",
    "igso3_score_vec",
    "igso3_log_prob_haar",
    "cdf_locs",
    "build_cdf_np",
    "build_cdf",
    "IGSO3Table",
    "IsotropicGaussianSO3",
    "IGSO3xR3",
    "Bingham",
]

_PI = math.pi


# ---------------------------------------------------------------------------
# Reference-exact density (host/numpy, float64 -> float32)
# ---------------------------------------------------------------------------

def igso3_series_np(t: np.ndarray, eps: np.ndarray) -> np.ndarray:
    """Bit-faithful port of the reference ``_eps_ft``
    (``distributions.py:53-72``): float64 evaluation, inf/nan scrubbed to 0,
    t == 0 patched with the analytic limit, cast to float32.

    Used for golden tests and host-side CDF table builds; the on-device path
    is ``igso3_log_density``.
    """
    t_d, var_d = np.broadcast_arrays(
        np.asarray(t, dtype=np.float64), np.asarray(eps, dtype=np.float64) ** 2
    )
    with np.errstate(over="ignore", invalid="ignore", divide="ignore"):
        vals = (
            math.sqrt(_PI)
            * var_d ** (-3 / 2)
            * np.exp(var_d / 4)
            * np.exp(-((t_d / 2) ** 2) / var_d)
            * (
                t_d
                - np.exp((-_PI**2) / var_d)
                * (
                    (t_d - 2 * _PI) * np.exp(_PI * t_d / var_d)
                    + (t_d + 2 * _PI) * np.exp(-_PI * t_d / var_d)
                )
            )
            / (2 * np.sin(t_d / 2))
        )
    vals = np.where(np.isinf(vals) | np.isnan(vals), 0.0, vals)
    with np.errstate(over="ignore", invalid="ignore"):
        # NOTE: this reproduces the reference's t==0 patch *verbatim*,
        # including its wrong limit constant (4 pi^2 q instead of
        # 4 pi^2 q / var; see igso3_log_density) and its float64 overflow to
        # inf/nan for small eps ("too big to flit in float32" in the
        # reference's own comment).
        limit = (
            math.sqrt(_PI)
            * (
                var_d * np.exp(2 * _PI**2 / var_d)
                - 2 * var_d * np.exp(_PI**2 / var_d)
                + 4 * _PI**2 * var_d * np.exp(_PI**2 / var_d)
            )
            * np.exp(var_d / 4 - (2 * _PI**2) / var_d)
            / var_d ** (5 / 2)
        )
        vals = np.where(t_d == 0, limit, vals)
    return vals.astype(np.float32)


# ---------------------------------------------------------------------------
# Float32-safe log-space density + analytic score (device, jit/grad-safe)
# ---------------------------------------------------------------------------

def _wrap_terms(t: jax.Array, var: jax.Array):
    """A(t) and A'(t), the wrapped-image correction polynomial, regrouped as

        A(t)  = t (1 - 2 q cosh x) + 4 pi q sinh x,      x = pi t / var,
        A'(t) = (1 - 2 q cosh x) - 2 t (pi/var) q sinh x + (4 pi^2/var) q cosh x

    with q = e^(-pi^2/var).  The naive form ``t - (t-2pi) e1 - (t+2pi) e2``
    (reference ``distributions.py:57-59``) cancels catastrophically in
    float32 for small t at large sigma; the sinh grouping is cancellation-free.
    q cosh x / q sinh x are computed two ways and ``where``-selected:

    * x < 1:  q * sinh(x) directly (sinh accurate near 0; q underflows to 0
      exactly when the correction is negligible),
    * x >= 1: (e1 -/+ e2)/2 with e1 = e^((pi t - pi^2)/var),
      e2 = e^(-(pi t + pi^2)/var) — both exponents <= 0 for t in [0, pi], so
      bounded in [0, 1]: float32-safe, never overflows.

    This is what lets the whole density live in float32 where the reference
    needed float64 + inf/nan scrubbing.
    """
    u = _PI / var
    x = u * t
    e1 = jnp.exp(x - _PI * u)  # q e^x
    e2 = jnp.exp(-x - _PI * u)  # q e^-x
    small_x = x < 1.0
    x_s = jnp.where(small_x, x, 0.0)  # sanitise to avoid inf in dead branch
    q = jnp.exp(-_PI * u)
    qs = jnp.where(small_x, q * jnp.sinh(x_s), 0.5 * (e1 - e2))
    qc = jnp.where(small_x, q * jnp.cosh(x_s), 0.5 * (e1 + e2))
    one_m2qc = 1.0 - 2.0 * qc
    a = t * one_m2qc + 4.0 * _PI * qs
    da = one_m2qc - 2.0 * t * u * qs + 4.0 * _PI * u * qc
    return a, da


def igso3_log_density(t: jax.Array, sigma: jax.Array) -> jax.Array:
    """log f(t; sigma), the IGSO(3) density over the rotation *angle* without
    the Haar (1-cos t)/pi measure factor — the same convention as the
    reference's ``log_prob`` (``distributions.py:74-77``).

    Finite and accurate in float32 for sigma down to ~1e-3 and all
    t in [0, pi].  ``t`` and ``sigma`` broadcast.
    """
    t, sigma = jnp.broadcast_arrays(t, sigma)
    var = sigma * sigma
    a, da = _wrap_terms(t, var)
    # ratio = A(t) / (2 sin(t/2));  A(0) = 0, so t -> 0 needs A'(0).
    small = t < 1e-6
    t_safe = jnp.where(small, 1.0, t)
    ratio = jnp.where(
        small, da, a / (2.0 * jnp.sin(t_safe / 2.0))
    )
    # Reference-parity patch at exactly t == 0: ``distributions.py:68-71``
    # hardcodes the limit constant with a ``4 pi^2 q`` term where the true
    # limit of its own series is ``4 pi^2 q / var`` (they agree only at
    # var = 1; for small sigma both reduce to 1).  We reproduce the
    # reference's value on the measure-zero point t == 0 so golden parity
    # holds everywhere, and use the correct limit for all t > 0.
    q = jnp.exp(-_PI * _PI / var)
    ref_limit = 1.0 - 2.0 * q + 4.0 * _PI * _PI * q
    ratio = jnp.where(t == 0.0, ref_limit, ratio)
    log_c = (
        0.5 * math.log(_PI)
        - 1.5 * jnp.log(var)
        + var / 4.0
        - (t * t) / (4.0 * var)
    )
    return log_c + jnp.log(jnp.maximum(ratio, 1e-38))


def igso3_density(t: jax.Array, sigma: jax.Array) -> jax.Array:
    """f(t; sigma) in linear space (exp of the log density)."""
    return jnp.exp(igso3_log_density(t, sigma))


def igso3_score_angle(t: jax.Array, sigma: jax.Array) -> jax.Array:
    """d/dt log f(t; sigma), closed form.

    The apparent 1/t poles of A'/A and -cot(t/2)/2 cancel; the small-t branch
    uses the analytic limit  A''(0)/(2 A'(0)) + t/12 - t/(2 var)  with
    A''(0) = -2 pi q / var, q = e^(-pi^2/var).
    """
    t, sigma = jnp.broadcast_arrays(t, sigma)
    var = sigma * sigma
    a, da = _wrap_terms(t, var)
    small = t < 1e-4
    t_safe = jnp.where(small, 1.0, t)
    direct = (
        -t / (2.0 * var)
        + da / jnp.where(small, 1.0, a)
        - 0.5 / jnp.tan(t_safe / 2.0)
    )
    q = jnp.exp(-_PI * _PI / var)
    ddA0 = -2.0 * _PI * q / var
    dA0 = 1.0 + 2.0 * q * (2.0 * _PI * _PI / var - 1.0)
    limit = ddA0 / (2.0 * dA0) + t / 12.0 - t / (2.0 * var)
    return jnp.where(small, limit, direct)


def igso3_score_vec(r_mat: jax.Array, sigma: jax.Array) -> jax.Array:
    """Riemannian score grad_R log p at R (tangent skew-vec coordinates):
    axis(R) * d/dtheta log f(theta; sigma).

    The reference has no analytic score (it autodiffs through ``log_prob``,
    ``distributions.py:190``); this closed form is the building block for
    score-matching losses and probability-flow samplers.  On TPU the
    (log f, score) pair comes from the fused Pallas kernel.
    """
    from ..utils.backend import use_pallas_tpu

    axis, angle = rmat_to_aa(r_mat)
    theta = angle[..., 0]
    if use_pallas_tpu():
        from .igso3_pallas import igso3_logpdf_score_pallas

        _, score = igso3_logpdf_score_pallas(theta, jnp.broadcast_to(sigma, theta.shape))
        return axis * score[..., None]
    return axis * igso3_score_angle(theta, sigma)[..., None]


def igso3_log_prob_haar(t: jax.Array, sigma: jax.Array) -> jax.Array:
    """log of the density over SO(3) w.r.t. the angle marginal: adds the
    (1 - cos t)/pi Haar factor that the reference's ``sample()`` uses but its
    ``log_prob`` omits (quirk documented in SURVEY.md)."""
    return igso3_log_density(t, sigma) + jnp.log(
        jnp.maximum((1.0 - jnp.cos(t)) / _PI, 1e-38)
    )


# ---------------------------------------------------------------------------
# Inverse-CDF tables
# ---------------------------------------------------------------------------

_GRID_N = 1000


def cdf_locs(dtype=np.float32) -> np.ndarray:
    """The reference's angle grid: pi * linspace(0, 1, 1000)^3 — cubic
    packing near 0 (``distributions.py:15``).  Evaluated in float32 like the
    reference (torch.linspace default dtype) so the grid is bit-identical."""
    lin = np.linspace(0.0, 1.0, _GRID_N, dtype=np.float32)
    return (np.float32(_PI) * (lin**np.float32(3.0))).astype(dtype)


def build_cdf_np(eps: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side (float64 density -> float32 trapezoid) CDF build reproducing
    ``distributions.py:15-30`` exactly, vectorised over any-shaped ``eps``.

    Returns ``(trap_locs (999,), cdf (*eps.shape, 999))`` with the grid axis
    LAST (TPU lane-friendly; the reference keeps it first).
    """
    eps = np.asarray(eps, dtype=np.float32)
    locs = cdf_locs()  # (1000,)
    f = igso3_series_np(locs, eps[..., None])  # (*eps.shape, 1000)
    with np.errstate(invalid="ignore"):
        # f can be inf at t == 0 for small eps (reference patch semantics);
        # the t == 0 cell is zeroed right below, as in distributions.py:23.
        vals = f * ((1.0 - np.cos(locs)) / _PI).astype(np.float32)
    vals[..., locs == 0] = 0.0
    sums = vals[..., :-1] + vals[..., 1:]
    diffs = np.diff(locs)
    trap = np.cumsum(diffs * sums / 2.0, axis=-1, dtype=np.float32)
    # Degenerate rows (eps so small that all mass sits below the first grid
    # point, e.g. the t == 0 posterior stdev ~1e-10): total mass underflows
    # to 0.  Treat as a delta at angle ~ 0: cdf == 1 everywhere, so
    # inverse-transform sampling returns the first grid location (~3e-9 rad).
    total = trap[..., -1:]
    trap = np.where(total > 0.0, trap / np.maximum(total, 1e-38), 1.0)
    return locs[1:], trap


def build_cdf(eps: jax.Array) -> tuple[jax.Array, jax.Array]:
    """On-device CDF build (float32 log-space density), for traced ``eps``.
    Same grid/trapezoid semantics as ``build_cdf_np``; used by the
    reference-parity ``IsotropicGaussianSO3`` class when eps is dynamic."""
    locs = jnp.asarray(cdf_locs())
    f = igso3_density(locs, eps[..., None])
    vals = f * ((1.0 - jnp.cos(locs)) / _PI)
    vals = jnp.where(locs == 0.0, 0.0, vals)
    sums = vals[..., :-1] + vals[..., 1:]
    diffs = jnp.diff(locs)
    trap = jnp.cumsum(diffs * sums / 2.0, axis=-1)
    total = trap[..., -1:]
    trap = jnp.where(total > 0.0, trap / jnp.maximum(total, 1e-38), 1.0)
    return locs[1:], trap


def _inverse_cdf_angles(
    key: jax.Array, trap_locs: jax.Array, cdf: jax.Array
) -> jax.Array:
    """Inverse-transform sample of rotation angles, one per CDF row.

    ``cdf``: (..., 999) rows; returns angles of shape ``cdf.shape[:-1]``.
    Reproduces the reference's count/gather/lerp scheme
    (``distributions.py:37-49``) with the grid axis last.
    """
    batch_shape = cdf.shape[:-1]
    unif = jax.random.uniform(key, batch_shape, dtype=cdf.dtype)
    return _angles_from_unif(unif, trap_locs, cdf)


def _angles_from_unif(
    unif: jax.Array, trap_locs: jax.Array, cdf: jax.Array
) -> jax.Array:
    idx_1 = jnp.sum(cdf <= unif[..., None], axis=-1).astype(jnp.int32)
    idx_1 = jnp.minimum(idx_1, cdf.shape[-1] - 1)
    idx_0 = jnp.maximum(idx_1 - 1, 0)
    trap_start = jnp.take_along_axis(cdf, idx_0[..., None], axis=-1)[..., 0]
    trap_end = jnp.take_along_axis(cdf, idx_1[..., None], axis=-1)[..., 0]
    trap_diff = jnp.maximum(trap_end - trap_start, 1e-6)
    weight = jnp.clip((unif - trap_start) / trap_diff, 0.0, 1.0)
    angle_start = trap_locs[idx_0]
    angle_end = trap_locs[idx_1]
    return angle_start + weight * (angle_end - angle_start)


_QUANTILES = 1024


def _quantile_knots(q: int, dtype=np.float64) -> np.ndarray:
    """Quantile knot positions u_k = m(k/(q-1)) under the rational-cubic
    map m(s) = s^3 / (s^3 + (1-s)^3).

    The inverse CDF of the angle marginal is steep at *both* ends — near
    u=0 it behaves like u^(1/3) (the Haar (1-cos t) factor gives CDF ~ t^3)
    and near u=1 the exponentially thin tail stretches toward pi — so
    uniform knots leave O(0.5 rad) worst-case lerp error in the tails.
    m(s) packs knots cubically at both ends (m ~ s^3 at 0, 1-(1-s)^3 at 1);
    measured worst-case table error over eps in [1e-10, 1.5]: 2.5e-4 rad at
    q=1024 (vs 0.6 rad with uniform knots).  m is invertible in closed
    form: s = r/(1+r) with r = cbrt(u/(1-u)) (see ``_quantile_pos``).
    """
    s = np.linspace(0.0, 1.0, q, dtype=dtype)
    u = s**3 / (s**3 + (1.0 - s) ** 3)
    return np.minimum(u, 1.0 - 1e-7)  # clamp so delta rows (cdf == 1
    # everywhere, e.g. the t == 0 posterior) resolve to the first grid
    # cell exactly as the runtime path does for any u < 1.


def _quantile_pos(u: jax.Array, q: int) -> jax.Array:
    """Fractional knot index of uniform draw ``u``: inverse of the
    rational-cubic knot map, times (q-1)."""
    r = jnp.cbrt(u / jnp.maximum(1.0 - u, 1e-12))
    s = r / (1.0 + r)
    return s * (q - 1)


def build_inv_cdf_np(trap_locs: np.ndarray, cdf: np.ndarray, q: int = _QUANTILES) -> np.ndarray:
    """Quantile table: exact piecewise-linear inversion of each trapezoid
    CDF row at ``q`` rational-cubic-spaced quantiles (host-side, built once).

    This turns per-sample inverse-transform sampling from a 999-wide
    row-gather + compare-reduce into two point gathers and a lerp
    (``IGSO3Table.sample_angles``): at eval sizes (20k chains x 1000 scan
    steps) that is ~1000x less HBM traffic per step.  The inversion uses
    the same ``cdf <= u`` bracketing as ``_angles_from_unif``, so table
    knots are exact; between knots the error is bounded at 2.5e-4 rad
    (``tests/test_igso3.py::test_quantile_table_matches_exact_sampling``).
    """
    cdf = np.asarray(cdf, dtype=np.float32)
    locs = np.asarray(trap_locs, dtype=np.float32)
    flat = cdf.reshape(-1, cdf.shape[-1])
    u = _quantile_knots(q).astype(np.float32)
    out = np.empty((flat.shape[0], q), dtype=np.float32)
    n = cdf.shape[-1]
    for r in range(flat.shape[0]):
        row = flat[r]
        idx_1 = np.minimum(
            np.searchsorted(row, u, side="right").astype(np.int64), n - 1
        )
        idx_0 = np.maximum(idx_1 - 1, 0)
        t_start, t_end = row[idx_0], row[idx_1]
        w = np.clip((u - t_start) / np.maximum(t_end - t_start, 1e-6), 0.0, 1.0)
        out[r] = locs[idx_0] + w * (locs[idx_1] - locs[idx_0])
    return out.reshape(*cdf.shape[:-1], q)


def build_inv_cdf(trap_locs: jax.Array, cdf: jax.Array, q: int = _QUANTILES) -> jax.Array:
    """On-device quantile-table build (for traced eps); same semantics as
    ``build_inv_cdf_np``."""
    u = jnp.asarray(_quantile_knots(q), dtype=cdf.dtype)
    n = cdf.shape[-1]
    idx_1 = jnp.minimum(
        jax.vmap(lambda row: jnp.searchsorted(row, u, side="right"))(
            cdf.reshape(-1, n)
        ),
        n - 1,
    ).astype(jnp.int32)
    idx_0 = jnp.maximum(idx_1 - 1, 0)
    rows = cdf.reshape(-1, n)
    t_start = jnp.take_along_axis(rows, idx_0, axis=-1)
    t_end = jnp.take_along_axis(rows, idx_1, axis=-1)
    w = jnp.clip((u - t_start) / jnp.maximum(t_end - t_start, 1e-6), 0.0, 1.0)
    angles = trap_locs[idx_0] + w * (trap_locs[idx_1] - trap_locs[idx_0])
    return angles.reshape(*cdf.shape[:-1], q)


def _random_axes(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    axes = jax.random.normal(key, (*shape, 3), dtype=dtype)
    return axes / jnp.maximum(
        jnp.linalg.norm(axes, axis=-1, keepdims=True), 1e-12
    )


@struct.dataclass
class IGSO3Table:
    """Precomputed inverse-CDF tables for a fixed family of noise levels.

    For a T-step diffusion the family is the T per-timestep eps values, so
    the entire IGSO(3) sampling machinery is this pair of (T, grid) arrays —
    built once at process construction, indexed by timestep inside jit.
    This is the structural fix for the reference's per-step table rebuild
    (``diffusion.py:350,404,507``).

    Two representations are kept:

    * ``cdf`` (T, 999): the reference-parity trapezoid CDF (golden-matched
      bit-for-bit; drives ``sample_angles_exact`` and the golden tests),
    * ``inv_cdf`` (T, 1024): its piecewise-linear inverse at uniform
      quantiles — the production sampling path: two point gathers + lerp
      per sample instead of a 999-wide row gather + compare-reduce.
    """

    trap_locs: jax.Array  # (999,)
    cdf: jax.Array  # (K, 999)
    inv_cdf: jax.Array  # (K, 1024)
    eps: jax.Array  # (K,)

    @classmethod
    def from_eps(cls, eps, use_numpy: bool = True) -> "IGSO3Table":
        eps = np.asarray(eps, dtype=np.float32).reshape(-1)
        if use_numpy:
            locs, cdf = build_cdf_np(eps)
            inv = build_inv_cdf_np(locs, cdf)
            return cls(
                jnp.asarray(locs), jnp.asarray(cdf), jnp.asarray(inv),
                jnp.asarray(eps),
            )
        locs, cdf = build_cdf(jnp.asarray(eps))
        return cls(locs, cdf, build_inv_cdf(locs, cdf), jnp.asarray(eps))

    def sample_angles(self, key: jax.Array, idx: jax.Array) -> jax.Array:
        """Angles ~ IGSO3(eps[idx]); ``idx`` any integer shape.

        Production path: quantile-table lookup — two point gathers from
        ``inv_cdf`` and a lerp.  (A fused Pallas sampler kernel was tried
        and rejected: per-sample CDF-row DMA cannot satisfy Mosaic's block
        rules without serialising samples; gathers belong to XLA.  See
        BENCHMARKS.md "IGSO(3) sampling".)
        """
        unif = jax.random.uniform(key, idx.shape, dtype=self.inv_cdf.dtype)
        return self.quantile_angles(unif, idx)

    def quantile_angles(self, u: jax.Array, idx: jax.Array) -> jax.Array:
        """Deterministic inverse CDF: the angle whose IGSO3(eps[idx]) CDF
        is ``u`` (the lookup ``sample_angles`` performs on uniform draws)."""
        q = self.inv_cdf.shape[-1]
        pos = _quantile_pos(jnp.clip(u, 0.0, 1.0 - 1e-7), q)
        k0 = jnp.floor(pos).astype(jnp.int32)
        k0 = jnp.minimum(k0, q - 2)
        frac = pos - k0
        a0 = self.inv_cdf[idx, k0]
        a1 = self.inv_cdf[idx, k0 + 1]
        return a0 + frac * (a1 - a0)

    def cdf_angles(self, theta: jax.Array, idx: jax.Array) -> jax.Array:
        """CDF_{eps[idx]}(theta): linear interpolation of the trapezoid CDF
        row on the reference's cubic-packed angle grid (``cdf_locs``:
        locs[i] = pi * (i/999)^3, so the fractional grid index of any angle
        is closed-form — no searchsorted)."""
        n = self.cdf.shape[-1]  # 999; trap_locs = locs[1:], CDF(locs[0]) = 0
        pos = jnp.cbrt(jnp.clip(theta, 0.0, _PI) / _PI) * n  # in [0, n]
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
        frac = pos - i0
        c_lo = jnp.where(i0 == 0, 0.0, self.cdf[idx, jnp.maximum(i0 - 1, 0)])
        c_hi = self.cdf[idx, i0]
        return c_lo + frac * (c_hi - c_lo)

    def transport_angles(
        self, theta: jax.Array, idx_src: jax.Array, idx_dst: jax.Array
    ) -> jax.Array:
        """Exact radial probability-flow map IGSO3(eps[idx_src]) ->
        IGSO3(eps[idx_dst]): quantile transport theta' = Q_dst(F_src(theta)).

        For an isotropic family the probability-flow ODE
        d(theta)/d(sigma) = -sigma * score(theta; sigma) has a radial
        velocity field, and the unique radial transport preserving the
        angle marginals is the CDF/quantile map — so this IS the exact
        integral of the score ODE between the two noise levels, with no
        discretization error (the closed form behind
        ``SO3Diffusion.pf_sample_loop(method="flow")``).  In the Gaussian
        (small-eps) limit it reduces to the DDIM rescale
        theta' = theta * eps_dst / eps_src."""
        return self.quantile_angles(self.cdf_angles(theta, idx_src), idx_dst)

    def sample_angles_exact(self, key: jax.Array, idx: jax.Array) -> jax.Array:
        """Reference-exact bracketing path (gathers full CDF rows); kept
        for golden/parity tests and error-bounding the quantile table."""
        unif = jax.random.uniform(key, idx.shape, dtype=self.cdf.dtype)
        rows = self.cdf[idx]  # (..., 999)
        return _angles_from_unif(unif, self.trap_locs, rows)

    def sample(self, key: jax.Array, idx: jax.Array) -> jax.Array:
        """Rotations ~ IGSO3(eps[idx]), shape (*idx.shape, 3, 3)."""
        k_axis, k_angle = jax.random.split(key)
        angles = self.sample_angles(k_angle, idx)
        axes = _random_axes(k_axis, idx.shape)
        return exp_skewvec(axes * angles[..., None])


# ---------------------------------------------------------------------------
# Distribution-API parity classes
# ---------------------------------------------------------------------------

@struct.dataclass
class IsotropicGaussianSO3:
    """API-parity equivalent of ``distributions.py:8-81``: arbitrary-shaped
    ``eps``, optional ``mean`` rotation.  The CDF table is built once at
    construction (vectorised, device-side) instead of per ``sample()`` call.

    Being a flax struct, instances are pytrees: construct outside jit and
    close over, or construct inside jit (the table build is itself jittable).
    """

    eps: jax.Array
    mean: jax.Array
    trap_locs: jax.Array
    cdf: jax.Array

    @classmethod
    def create(cls, eps, mean=None) -> "IsotropicGaussianSO3":
        eps = jnp.asarray(eps, dtype=jnp.float32)
        if mean is None:
            mean = jnp.eye(3, dtype=eps.dtype)
        locs, cdf = build_cdf(eps)
        return cls(eps=eps, mean=mean, trap_locs=locs, cdf=cdf)

    def sample(self, key: jax.Array, sample_shape=()) -> jax.Array:
        """mean @ aa_to_rmat(uniform axis, inverse-CDF angle)
        (reference: ``distributions.py:33-51``)."""
        k_axis, k_angle = jax.random.split(key)
        batch = (*sample_shape, *self.eps.shape)
        rows = jnp.broadcast_to(self.cdf, (*batch, self.cdf.shape[-1]))
        angles = _inverse_cdf_angles(k_angle, self.trap_locs, rows)
        axes = _random_axes(k_axis, batch)
        return rmul(self.mean, exp_skewvec(axes * angles[..., None]))

    def log_prob(self, rotations: jax.Array) -> jax.Array:
        """log f(theta(R)); same no-Haar-factor convention as the reference
        (``distributions.py:74-77``), but finite where the reference's
        float32 density underflows.  TPU: fused Pallas kernel."""
        from ..utils.backend import use_pallas_tpu

        angle = rotation_angle(rotations)
        if use_pallas_tpu():
            from .igso3_pallas import igso3_logpdf_score_pallas

            angle_b, eps_b = jnp.broadcast_arrays(angle, self.eps)
            logf, _ = igso3_logpdf_score_pallas(angle_b, eps_b)
            return logf
        return igso3_log_density(angle, self.eps)


@struct.dataclass
class IGSO3xR3:
    """Product distribution SO(3) x R^3 (reference: ``distributions.py:84-110``):
    IGSO3(eps) on the rotation, Normal(mean.shift, eps * shift_scale) on the
    shift."""

    igso3: IsotropicGaussianSO3
    mean_shift: jax.Array
    shift_scale: float = struct.field(pytree_node=False, default=1.0)

    @classmethod
    def create(cls, eps, mean: AffineT | None = None, shift_scale: float = 1.0):
        eps = jnp.asarray(eps, dtype=jnp.float32)
        if mean is None:
            mean = AffineT(
                jnp.eye(3, dtype=eps.dtype),
                jnp.zeros((*eps.shape, 3), dtype=eps.dtype),
            )
        return cls(
            igso3=IsotropicGaussianSO3.create(eps, mean.rot),
            mean_shift=mean.shift,
            shift_scale=shift_scale,
        )

    def sample(self, key: jax.Array, sample_shape=()) -> AffineT:
        k_rot, k_shift = jax.random.split(key)
        rot = self.igso3.sample(k_rot, sample_shape)
        eps = self.igso3.eps
        shift = self.mean_shift + eps[..., None] * self.shift_scale * (
            jax.random.normal(
                k_shift, (*sample_shape, *eps.shape, 3), dtype=eps.dtype
            )
        )
        return AffineT(rot, shift)

    def log_prob(self, value: AffineT) -> jax.Array:
        rot_lp = self.igso3.log_prob(value.rot)
        scale = self.igso3.eps[..., None] * self.shift_scale
        z = (value.shift - self.mean_shift) / scale
        shift_lp = jnp.sum(
            -0.5 * z * z - jnp.log(scale) - 0.5 * math.log(2 * _PI), axis=-1
        )
        return rot_lp + shift_lp


@struct.dataclass
class Bingham:
    """Projected zero-mean Gaussian on the quaternion 3-sphere — keeps the
    reference's (mis)name and semantics (``distributions.py:113-127``: a
    ``MultivariateNormal`` whose samples are L2-normalised, NOT a true
    Bingham density)."""

    scale_tril: jax.Array  # (4, 4) cholesky factor of the covariance

    @classmethod
    def create(cls, covariance_matrix) -> "Bingham":
        cov = jnp.asarray(covariance_matrix, dtype=jnp.float32)
        return cls(scale_tril=jnp.linalg.cholesky(cov))

    def sample(self, key: jax.Array, sample_shape=()) -> jax.Array:
        z = jax.random.normal(key, (*sample_shape, 4), dtype=self.scale_tril.dtype)
        vals = jnp.matmul(z, self.scale_tril.T, precision=MM)
        return vals / jnp.linalg.norm(vals, axis=-1, keepdims=True)
