"""Tests for the accelerated DDIM samplers (beyond-reference capability)."""
import numpy as np
import jax
import jax.numpy as jnp

from diffusion_extensions_tpu.ops import so3 as so3_ops
from diffusion_extensions_tpu.processes import GaussianDiffusion, SO3Diffusion
from diffusion_extensions_tpu.processes.schedule import extract


def test_so3_ddim_shapes_and_orthogonality():
    proc = SO3Diffusion.create(1000)

    def denoise(x, t):
        return jnp.zeros((x.shape[0], 3))

    out = jax.jit(
        lambda k: proc.ddim_sample_loop(denoise, k, (16,), num_steps=10)
    )(jax.random.PRNGKey(0))
    assert out.shape == (16, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3), out.shape)
    ortho = jnp.matmul(out, jnp.swapaxes(out, -1, -2),
                       precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(ortho, eye, atol=1e-4)


def test_so3_ddim_oracle_converges_to_delta():
    """With the oracle denoiser for a delta distribution at the identity
    (true descaled noise = log(x_t)/eps_t since sqrt(acp)*I scales to I),
    DDIM must land on the identity from any start in few steps."""
    proc = SO3Diffusion.create(1000)
    s = proc.schedule

    def oracle(x, t):
        eps = extract(s.sqrt_one_minus_alphas_cumprod, t, 1)
        return so3_ops.log_rmat_vec(x) / eps

    out = jax.jit(
        lambda k: proc.ddim_sample_loop(oracle, k, (64,), num_steps=25)
    )(jax.random.PRNGKey(1))
    angles = np.asarray(so3_ops.rotation_angle(out))
    assert angles.max() < 0.05, angles.max()


def test_r3_ddim_oracle_converges_to_delta():
    """Oracle for a delta at 0: eps_pred = x / sqrt(1 - acp_t)."""
    proc = GaussianDiffusion.create(1000)
    s = proc.schedule

    def oracle(x, t):
        return x / extract(s.sqrt_one_minus_alphas_cumprod, t, 1)

    out = jax.jit(
        lambda k: proc.ddim_sample_loop(
            oracle, k, (64, 3), num_steps=25, clip_denoised=False
        )
    )(jax.random.PRNGKey(2))
    assert np.abs(np.asarray(out)).max() < 1e-3


def test_ddim_step_count_vs_quality_tradeoff():
    """More DDIM steps should not blow up; both run and stay finite."""
    proc = SO3Diffusion.create(100)

    def denoise(x, t):
        return 0.1 * so3_ops.log_rmat_vec(x)

    for n in (5, 50):
        out = jax.jit(
            lambda k: proc.ddim_sample_loop(denoise, k, (8,), num_steps=n)
        )(jax.random.PRNGKey(3))
        assert np.isfinite(np.asarray(out)).all()


def test_se3_ddim_oracle_converges_to_delta():
    """Oracle for a delta at (I, 0): rot_g = log(R_t)/eps_t, shift_g =
    shift_t / (eps_t * sqrt(1/acp-1)... the exact inversion of
    predict_start_from_noise); DDIM must dock to identity/zero shift."""
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
        lambda k: proc.ddim_sample_loop(oracle, k, (64,), num_steps=25)
    )(jax.random.PRNGKey(3))
    angles = np.asarray(so3_ops.rotation_angle(out.rot))
    shifts = np.linalg.norm(np.asarray(out.shift), axis=-1)
    assert angles.max() < 0.05, angles.max()
    assert shifts.max() < 0.05, shifts.max()


def test_euler_ddim_oracle_converges_to_delta():
    """Euler-baseline DDIM with the inherited R^n semantics: oracle
    eps_pred = x / sqrt(1-acp) lands the 6-vector on zero."""
    from diffusion_extensions_tpu.processes.euler import ProjectedEulerDiffusion

    proc = ProjectedEulerDiffusion.create(timesteps=1000)
    s = proc.schedule

    def oracle(x, t):
        return x / extract(s.sqrt_one_minus_alphas_cumprod, t, 1)

    out = jax.jit(
        lambda k: proc.ddim_sample_loop(oracle, k, (64, 6), num_steps=25)
    )(jax.random.PRNGKey(4))
    assert np.abs(np.asarray(out)).max() < 1e-2
