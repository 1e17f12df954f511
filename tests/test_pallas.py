"""Pallas kernels vs their XLA references (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_extensions_tpu.ops import igso3, metrics, so3
from diffusion_extensions_tpu.ops.igso3_pallas import igso3_logpdf_score_pallas
from diffusion_extensions_tpu.ops.mmd_pallas import (
    gaussian_kernel_sum_pallas,
    mmd_pallas,
)


def test_igso3_pallas_matches_xla():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.uniform(0.0, np.pi, size=(1000,)).astype(np.float32))
    t = t.at[0].set(0.0)  # include the t == 0 reference-patch path
    sigma = jnp.asarray(
        rng.uniform(0.02, 1.5, size=(1000,)).astype(np.float32)
    )
    logf, score = igso3_logpdf_score_pallas(t, sigma, interpret=True)
    ref_logf = igso3.igso3_log_density(t, sigma)
    ref_score = igso3.igso3_score_angle(t, sigma)
    np.testing.assert_allclose(logf, ref_logf, rtol=1e-5, atol=1e-5)
    # the kernel's Taylor sinh/cosh and the XLA sinh differ by <5e-4 at the
    # x ~= 0.5 branch boundary where the score crosses zero
    np.testing.assert_allclose(score, ref_score, rtol=1e-4, atol=5e-4)


def test_igso3_pallas_shapes_and_broadcast():
    logf, score = igso3_logpdf_score_pallas(
        jnp.linspace(0.1, 3.0, 7).reshape(7, 1),
        jnp.asarray([0.5]),
        interpret=True,
    )
    assert logf.shape == (7, 1)
    assert score.shape == (7, 1)
    # tiny input (far below one tile)
    logf1, _ = igso3_logpdf_score_pallas(
        jnp.asarray([0.5]), jnp.asarray([0.3]), interpret=True
    )
    np.testing.assert_allclose(
        logf1, igso3.igso3_log_density(jnp.asarray([0.5]), jnp.asarray([0.3])),
        rtol=1e-5,
    )


def test_mmd_pallas_matches_xla():
    key = jax.random.PRNGKey(0)
    x = so3.exp_skewvec(jax.random.normal(key, (300, 3)))
    y = so3.exp_skewvec(jax.random.normal(jax.random.fold_in(key, 1), (200, 3)) * 0.3)
    ref = jnp.sum(metrics.gaussian_kernel_matrix(x, y))
    ours = gaussian_kernel_sum_pallas(x, y, interpret=True)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    ref_mmd = metrics.mmd(x[:200], y, metrics.gaussian_kernel_matrix)
    ours_mmd = mmd_pallas(x[:200], y, interpret=True)
    np.testing.assert_allclose(float(ours_mmd), float(ref_mmd), rtol=1e-3, atol=1e-5)


def test_mmd_pallas_padding_masked():
    """Sizes not divisible by the block must not pick up padded-lane terms."""
    key = jax.random.PRNGKey(2)
    x = so3.exp_skewvec(jax.random.normal(key, (257, 3)))
    y = so3.exp_skewvec(jax.random.normal(jax.random.fold_in(key, 3), (130, 3)))
    ref = jnp.sum(metrics.gaussian_kernel_matrix(x, y))
    ours = gaussian_kernel_sum_pallas(x, y, interpret=True)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


# NOTE: round 1 had a scalar-prefetch Pallas sampling kernel here; it only
# ever ran under the interpreter — its (1, 1024) CDF-row blocks violate
# Mosaic's block rules on hardware — and was replaced by the quantile-table
# sampling path (tests in test_igso3.py::test_quantile_table_*).
