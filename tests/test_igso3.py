"""Golden + statistical tests for the IGSO(3) distribution machinery."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_extensions_tpu.ops import igso3, so3
from conftest import require_golden


@pytest.fixture(scope="module")
def g():
    return require_golden("igso3.npz")


def test_series_np_matches_reference(g):
    """The numpy float64 path must match the reference _eps_ft bitwise-close."""
    t, eps = g["t"], g["eps"]
    ours = igso3.igso3_series_np(t[None, :].astype(np.float64), eps[:, None].astype(np.float64))
    np.testing.assert_allclose(ours, g["dens"], rtol=1e-6, atol=1e-7)


def test_log_density_matches_reference_1e5(g):
    """BASELINE gate: IGSO(3) log-density max error <= 1e-5 vs reference,
    on the region where the reference's float32 density is nonzero."""
    t, eps = jnp.asarray(g["t"]), jnp.asarray(g["eps"])
    ref = g["dens"]
    log_ours = np.asarray(igso3.igso3_log_density(t[None, :], eps[:, None]))
    mask = ref > 0
    log_ref = np.log(ref[mask])
    err = np.abs(log_ours[mask] - log_ref)
    # exclude reference float32-rounding noise: compare where |log| not huge
    sane = np.abs(log_ref) < 30
    assert err[sane].max() < 1e-5, err[sane].max()


def test_density_linear_matches(g):
    t, eps = jnp.asarray(g["t"]), jnp.asarray(g["eps"])
    ref = g["dens"]
    ours = np.asarray(igso3.igso3_density(t[None, :], eps[:, None]))
    mask = ref > 1e-30
    rel = np.abs(ours[mask] - ref[mask]) / np.maximum(np.abs(ref[mask]), 1e-30)
    assert rel.max() < 1e-4, rel.max()


def test_cdf_table_matches_reference(g):
    eps_tab = g["eps_tab"]
    locs, cdf = igso3.build_cdf_np(eps_tab)
    np.testing.assert_allclose(locs, g["trap_loc"], atol=1e-6)
    # reference layout is (999, B); ours (B, 999)
    np.testing.assert_allclose(cdf, g["trap"].T, atol=2e-6)


def test_cdf_table_jnp_close_to_np():
    eps = np.array([0.05, 0.3, 1.0], dtype=np.float32)
    locs_np, cdf_np = igso3.build_cdf_np(eps)
    locs_j, cdf_j = igso3.build_cdf(jnp.asarray(eps))
    np.testing.assert_allclose(locs_j, locs_np, atol=1e-6)
    np.testing.assert_allclose(cdf_j, cdf_np, atol=5e-5)


def test_log_prob_golden(g):
    d = igso3.IsotropicGaussianSO3.create(jnp.float32(0.5))
    lp = np.asarray(d.log_prob(jnp.asarray(g["rots"])))
    ref = g["log_prob_eps05"].squeeze(-1)  # reference keeps a trailing dim
    ok = np.isfinite(ref)
    assert np.abs(lp[ok] - ref[ok]).max() < 1e-4


def test_score_matches_autodiff():
    t = jnp.linspace(0.05, 3.1, 50)
    sigma = jnp.float32(0.4)
    analytic = igso3.igso3_score_angle(t, sigma)
    auto = jax.vmap(jax.grad(lambda tt: igso3.igso3_log_density(tt, sigma)))(t)
    np.testing.assert_allclose(analytic, auto, rtol=1e-3, atol=1e-4)


def test_score_small_t_finite():
    t = jnp.asarray([0.0, 1e-7, 1e-5, 1e-3])
    s = igso3.igso3_score_angle(t, jnp.float32(0.3))
    assert np.isfinite(np.asarray(s)).all()


def test_sample_histogram_matches_cdf():
    """Sampled angles must follow the reference CDF (inverse-transform
    correctness): compare empirical CDF against the table."""
    eps = np.array([0.5], dtype=np.float32)
    table = igso3.IGSO3Table.from_eps(eps)
    key = jax.random.PRNGKey(0)
    idx = jnp.zeros((20000,), dtype=jnp.int32)
    angles = np.asarray(table.sample_angles(key, idx))
    locs = np.asarray(table.trap_locs)
    cdf = np.asarray(table.cdf[0])
    # empirical CDF at interior grid points
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        a_q = np.interp(q, cdf, locs)
        emp = (angles <= a_q).mean()
        assert abs(emp - q) < 0.02, (q, emp)


def test_sample_rotation_angles_match_distribution():
    """Full rotation sampling: angle histogram vs analytic density."""
    d = igso3.IsotropicGaussianSO3.create(jnp.float32(0.8))
    key = jax.random.PRNGKey(1)
    rots = d.sample(key, (20000,))
    angles = np.asarray(so3.rotation_angle(rots))
    # compare mean/std against numeric integration of the angle density
    locs = igso3.cdf_locs().astype(np.float64)
    f = igso3.igso3_series_np(locs, np.float64(0.8)) * (1 - np.cos(locs)) / np.pi
    w = np.diff(locs)
    mids = 0.5 * (f[1:] + f[:-1])
    z = (mids * w).sum()
    mean_ref = ((0.5 * (locs[1:] + locs[:-1])) * mids * w).sum() / z
    assert abs(angles.mean() - mean_ref) < 0.01, (angles.mean(), mean_ref)


def test_sampled_angles_match_reference_distribution(g):
    """BASELINE gate: sampled-rotation geodesic-angle distributions match the
    reference's — two-sample KS test between 20k reference-sampled angles
    (torch RNG) and 20k of ours (jax RNG), eps = 0.5."""
    from scipy.stats import ks_2samp

    ref_angles = g["sampled_angles_eps05"]
    d = igso3.IsotropicGaussianSO3.create(jnp.float32(0.5))
    ours = np.asarray(
        so3.rotation_angle(d.sample(jax.random.PRNGKey(42), (20000,)))
    )
    stat, pvalue = ks_2samp(ref_angles, ours)
    assert pvalue > 0.01, (stat, pvalue)


def test_igso3table_per_timestep_rows():
    eps = np.linspace(0.01, 1.0, 10).astype(np.float32)
    table = igso3.IGSO3Table.from_eps(eps)
    key = jax.random.PRNGKey(2)
    idx = jnp.asarray([0, 9] * 500, dtype=jnp.int32)
    rots = table.sample(key, idx)
    assert rots.shape == (1000, 3, 3)
    angles = np.asarray(so3.rotation_angle(rots))
    small = angles[::2]  # eps = 0.01 rows
    big = angles[1::2]  # eps = 1.0 rows
    assert small.mean() < 0.05
    assert big.mean() > 0.5


def test_mean_rotation_applied():
    mean = so3.exp_skewvec(jnp.asarray([0.3, -0.2, 0.9]))
    d = igso3.IsotropicGaussianSO3.create(jnp.float32(0.01), mean=mean)
    rots = d.sample(jax.random.PRNGKey(3), (256,))
    dev = np.asarray(
        so3.rotation_angle(jnp.swapaxes(mean, -1, -2)[None] @ rots)
    )
    assert dev.max() < 0.1


def test_igso3xr3():
    from diffusion_extensions_tpu.ops.se3 import AffineT

    eps = jnp.full((16,), 0.2)
    d = igso3.IGSO3xR3.create(eps, shift_scale=75.0)
    out = d.sample(jax.random.PRNGKey(4))
    assert out.rot.shape == (16, 3, 3)
    assert out.shift.shape == (16, 3)
    shift_std = np.asarray(out.shift).std()
    assert 5.0 < shift_std < 40.0  # ~ 0.2*75 = 15
    lp = d.log_prob(out)
    assert np.isfinite(np.asarray(lp)).all()


def test_bingham_sampler():
    cov = jnp.asarray(np.diag([1000.0, 0.1, 0.1, 0.1]).astype(np.float32))
    b = igso3.Bingham.create(cov)
    q = b.sample(jax.random.PRNGKey(5), (4096,))
    norms = np.asarray(jnp.linalg.norm(q, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # dominated by first component
    assert np.abs(np.asarray(q)[:, 0]).mean() > 0.95


def test_sampling_is_jittable():
    table = igso3.IGSO3Table.from_eps(np.linspace(0.01, 1.0, 1000).astype(np.float32))

    @jax.jit
    def f(key, idx):
        return table.sample(key, idx)

    out = f(jax.random.PRNGKey(6), jnp.arange(32, dtype=jnp.int32))
    assert out.shape == (32, 3, 3)


def test_quantile_table_matches_exact_sampling():
    """The production quantile-table sampler (rational-cubic knots, two
    point gathers + lerp) matches the reference-exact CDF bracketing path
    to 1e-3 rad worst-case over the full eps range (same uniform draw)."""
    eps = np.concatenate(
        [np.asarray([1e-10, 1e-4, 1e-3]), np.linspace(0.01, 1.5, 40)]
    ).astype(np.float32)
    table = igso3.IGSO3Table.from_eps(eps)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (100_000,), 0, len(eps))
    k_draw = jax.random.fold_in(key, 1)
    fast = np.asarray(table.sample_angles(k_draw, idx))
    exact = np.asarray(table.sample_angles_exact(k_draw, idx))
    d = np.abs(fast - exact)
    assert d.max() < 1e-3, f"max quantile-table error {d.max()}"
    assert d.mean() < 5e-5


def test_quantile_table_degenerate_row_is_delta():
    """eps so small that all mass is below the first grid point must sample
    ~0 angles (delta at identity), never the pi sentinel."""
    table = igso3.IGSO3Table.from_eps(np.asarray([1e-10], np.float32))
    angles = table.sample_angles(
        jax.random.PRNGKey(3), jnp.zeros((4096,), jnp.int32)
    )
    assert float(jnp.max(angles)) < 1e-6
