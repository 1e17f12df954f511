"""Tests for the SO(3) probability-flow (ODE) sampler — the production
consumer of the analytic IGSO(3) score (``igso3_score_vec`` / the fused
Pallas kernel on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_extensions_tpu.ops import so3 as so3_ops
from diffusion_extensions_tpu.processes import SO3Diffusion
from diffusion_extensions_tpu.processes.schedule import extract


def _oracle(schedule):
    """Oracle denoiser for a delta distribution at the identity."""

    def oracle(x, t):
        eps = extract(schedule.sqrt_one_minus_alphas_cumprod, t, 1)
        return so3_ops.log_rmat_vec(x) / eps

    return oracle


@pytest.mark.parametrize("method", ["euler", "heun"])
def test_pf_shapes_and_orthogonality(method):
    proc = SO3Diffusion.create(1000)

    def denoise(x, t):
        return jnp.zeros((x.shape[0], 3))

    out = jax.jit(
        lambda k: proc.pf_sample_loop(denoise, k, (16,), num_steps=10,
                                      method=method)
    )(jax.random.PRNGKey(0))
    assert out.shape == (16, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3), out.shape)
    ortho = jnp.matmul(out, jnp.swapaxes(out, -1, -2),
                       precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(ortho, eye, atol=1e-4)


@pytest.mark.parametrize("method,steps,tol", [
    ("euler", 50, 0.15),
    ("heun", 25, 0.05),
    ("heun", 50, 0.05),
])
def test_pf_oracle_converges_to_delta(method, steps, tol):
    """With the oracle denoiser for a delta at the identity, the PF chain
    must contract to the identity from a Haar init — the score term
    transports the residual noise to zero as sigma -> 0."""
    proc = SO3Diffusion.create(1000)
    out = jax.jit(
        lambda k: proc.pf_sample_loop(_oracle(proc.schedule), k, (64,),
                                      num_steps=steps, method=method)
    )(jax.random.PRNGKey(1))
    angles = np.asarray(so3_ops.rotation_angle(out))
    assert np.isfinite(angles).all()
    assert np.median(angles) < tol, np.median(angles)


def test_pf_deterministic_given_key_split():
    """The ODE chain is deterministic after the init draw: same key ->
    identical output; different keys -> different (init-dependent) output."""
    proc = SO3Diffusion.create(100)
    f = jax.jit(
        lambda k: proc.pf_sample_loop(_oracle(proc.schedule), k, (8,),
                                      num_steps=10)
    )
    a = f(jax.random.PRNGKey(5))
    b = f(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pf_invalid_method_raises():
    proc = SO3Diffusion.create(10)
    with pytest.raises(ValueError):
        proc.pf_sample_loop(
            lambda x, t: jnp.zeros((x.shape[0], 3)),
            jax.random.PRNGKey(0), (4,), method="rk4")


@pytest.mark.parametrize("method", ["euler", "heun"])
def test_se3_pf_oracle_converges_to_delta(method):
    """SE(3) PF chain with the oracle denoiser for a delta at (I, 0):
    both blocks must contract (rotation via the analytic IGSO(3) score,
    shift via the Gaussian conditional score)."""
    from diffusion_extensions_tpu.ops.se3 import AffineGrad
    from diffusion_extensions_tpu.processes.se3 import ProjectedSE3Diffusion

    proc = ProjectedSE3Diffusion(timesteps=1000, clip_shift=75.0)
    s = proc.schedule

    def oracle(x, t):
        recip = extract(s.sqrt_recipm1_alphas_cumprod, t, 1)
        rot_g = so3_ops.log_rmat_vec(x.rot) / jnp.maximum(recip, 1e-8)
        shift_g = x.shift / jnp.maximum(recip * proc.shift_scale, 1e-8)
        return AffineGrad(rot_g, shift_g)

    out = jax.jit(
        lambda k: proc.pf_sample_loop(oracle, k, (64,), num_steps=25,
                                      method=method)
    )(jax.random.PRNGKey(3))
    angles = np.asarray(so3_ops.rotation_angle(out.rot))
    shifts = np.linalg.norm(np.asarray(out.shift), axis=-1)
    assert np.isfinite(angles).all() and np.isfinite(shifts).all()
    assert np.median(angles) < 0.1, np.median(angles)
    assert np.median(shifts) < 0.1, np.median(shifts)


def test_se3_pf_invalid_method_raises():
    from diffusion_extensions_tpu.processes.se3 import ProjectedSE3Diffusion

    proc = ProjectedSE3Diffusion(timesteps=10)
    with pytest.raises(ValueError):
        proc.pf_sample_loop(lambda x, t: None, jax.random.PRNGKey(0), (4,),
                            method="rk4")


def test_pf_time_grid_properties():
    """karras grid: descending, in-range, ends at 0, concentrated at low
    noise relative to uniform; uniform matches the legacy linspace."""
    from diffusion_extensions_tpu.processes.schedule import Schedule
    from diffusion_extensions_tpu.processes.so3 import pf_time_grid

    sched = Schedule.create(1000)
    for n in (10, 25, 50):
        k = np.asarray(pf_time_grid(sched, n, "karras"))
        assert k[0] == 999 and k[-1] == 0
        assert (np.diff(k) <= 0).all()
        assert (k >= 0).all() and (k <= 999).all()
        u = np.asarray(pf_time_grid(sched, n, "uniform"))
        legacy = np.asarray(
            jnp.linspace(999, 0, n + 1).round().astype(jnp.int32))
        assert (u == legacy).all()
        # low-noise concentration: karras spends at least twice as many
        # grid points in the bottom decile of timesteps as uniform does
        assert (k < 100).sum() >= 2 * (u < 100).sum()

    with pytest.raises(ValueError):
        pf_time_grid(sched, 10, "cosine")
