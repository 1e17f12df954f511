"""Golden + behavioral tests for the diffusion processes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_extensions_tpu.ops import se3 as se3_ops
from diffusion_extensions_tpu.ops import so3 as so3_ops
from diffusion_extensions_tpu.processes import (
    GaussianDiffusion,
    ProjectedEulerDiffusion,
    ProjectedGaussianDiffusion,
    ProjectedSE3Diffusion,
    ProjectedSO3Diffusion,
    Schedule,
    SE3Diffusion,
    SO3Diffusion,
    cosine_beta_schedule,
)
from conftest import require_golden


@pytest.fixture(scope="module")
def g():
    return require_golden("processes.npz")


@pytest.fixture(scope="module")
def sched(g):
    return Schedule.create(100, betas=g["betas"])


def test_schedule_buffers_golden(g, sched):
    np.testing.assert_allclose(sched.sqrt_alphas_cumprod, g["sqrt_acp"], atol=1e-6)
    np.testing.assert_allclose(
        sched.sqrt_one_minus_alphas_cumprod, g["sqrt_om_acp"], atol=1e-6
    )
    np.testing.assert_allclose(
        sched.sqrt_recip_alphas_cumprod, g["sqrt_recip_acp"], rtol=1e-5
    )
    np.testing.assert_allclose(
        sched.sqrt_recipm1_alphas_cumprod, g["sqrt_recipm1_acp"], rtol=1e-5
    )
    np.testing.assert_allclose(sched.posterior_variance, g["post_var_buf"], atol=1e-7)
    np.testing.assert_allclose(
        sched.posterior_log_variance_clipped, g["post_logvar_buf"], atol=1e-4
    )
    np.testing.assert_allclose(sched.posterior_mean_coef1, g["post_c1"], atol=1e-6)
    np.testing.assert_allclose(sched.posterior_mean_coef2, g["post_c2"], atol=1e-6)


def test_gaussian_process_golden(g):
    proc = GaussianDiffusion.create(100, betas=g["betas"])
    t = jnp.asarray(g["t"], dtype=jnp.int32)
    x, noise = jnp.asarray(g["x"]), jnp.asarray(g["noise"])
    np.testing.assert_allclose(proc.q_sample(x, t, noise), g["q_samp"], atol=1e-5)
    np.testing.assert_allclose(
        proc.predict_start_from_noise(x, t, noise), g["pred_x0"], rtol=1e-4, atol=1e-4
    )
    pm, pv, plv = proc.q_posterior(x, jnp.asarray(g["q_samp"]), t)
    np.testing.assert_allclose(pm, g["post_mean"], atol=1e-5)
    np.testing.assert_allclose(pv, g["post_var"], atol=1e-7)
    np.testing.assert_allclose(plv, g["post_logvar"], atol=1e-4)


def test_so3_process_golden(g):
    proc = SO3Diffusion.create(100, betas=g["betas"])
    t = jnp.asarray(g["t"], dtype=jnp.int32)
    rots = jnp.asarray(g["rots"])
    rots_noise = jnp.asarray(g["rots_noise"])
    q = proc.q_sample(rots, t, rots_noise)
    np.testing.assert_allclose(q, g["so3_q_samp"], atol=2e-4)
    pred = proc.predict_start_from_noise(rots, t, jnp.asarray(g["noise_vec"]))
    np.testing.assert_allclose(pred, g["so3_pred_x0"], atol=2e-4)
    pm, _, _ = proc.q_posterior(rots, q, t)
    np.testing.assert_allclose(pm, g["so3_post_mean"], atol=5e-4)


def test_se3_process_golden(g):
    proc = SE3Diffusion.create(100, betas=g["betas"])
    t = jnp.asarray(g["t"], dtype=jnp.int32)
    aff = se3_ops.AffineT(jnp.asarray(g["rots"]), jnp.asarray(g["shift"]))
    aff_n = se3_ops.AffineT(jnp.asarray(g["rots_noise"]), jnp.asarray(g["shift_n"]))
    q = proc.q_sample(aff, t, aff_n)
    np.testing.assert_allclose(q.rot, g["se3_q_rot"], atol=2e-4)
    np.testing.assert_allclose(q.shift, g["se3_q_shift"], atol=1e-5)
    grad = se3_ops.AffineGrad(jnp.asarray(g["noise_vec"]), jnp.asarray(g["shift_n"]))
    pred = proc.predict_start_from_noise(aff, t, grad)
    np.testing.assert_allclose(pred.rot, g["se3_pred_rot"], atol=2e-4)
    # Shift: the reference omits the shift_scale factor on the noise term
    # (diffusion.py:446-449) — its published SE(3) sampler random-walks.
    # We use the correct algebra; check against the reference golden with
    # the missing factor applied.
    sched = proc.schedule
    ns = np.asarray(sched.sqrt_recipm1_alphas_cumprod)[g["t"]][:, None]
    corrected = (
        g["se3_pred_shift"]
        - (proc.shift_scale - 1.0) * ns * g["shift_n"]
    )
    np.testing.assert_allclose(pred.shift, corrected, rtol=1e-3, atol=1e-3)


def test_cosine_schedule_properties():
    betas = cosine_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert (betas >= 0).all() and (betas <= 0.999).all()
    assert betas[-1] == 0.999  # cosine schedule saturates at the clip


def test_so3_q_sample_noise_statistics():
    """Forward-noised rotations at large t should be near-uniform; at small t
    should stay near the data."""
    proc = SO3Diffusion.create(1000)
    key = jax.random.PRNGKey(0)
    x0 = jnp.broadcast_to(jnp.eye(3), (512, 3, 3))
    t_small = jnp.full((512,), 10, dtype=jnp.int32)
    t_big = jnp.full((512,), 990, dtype=jnp.int32)
    n_small = proc.sample_noise(jax.random.fold_in(key, 0), t_small)
    n_big = proc.sample_noise(jax.random.fold_in(key, 1), t_big)
    a_small = so3_ops.rotation_angle(proc.q_sample(x0, t_small, n_small))
    a_big = so3_ops.rotation_angle(proc.q_sample(x0, t_big, n_big))
    assert float(a_small.mean()) < 0.2
    assert float(a_big.mean()) > 1.5  # uniform Haar mean angle ~ 2.0825


def test_so3_loss_and_grad():
    proc = SO3Diffusion.create(100)
    w = jnp.zeros((9 + 16, 3))  # trivial linear "model" params

    def denoise(params, x, t):
        feat = jnp.concatenate(
            [x.reshape(x.shape[0], 9), jnp.zeros((x.shape[0], 16))], axis=-1
        )
        return feat @ params

    x0 = so3_ops.exp_skewvec(
        jax.random.normal(jax.random.PRNGKey(1), (32, 3)) * 0.5
    )

    def loss_fn(params, key):
        return proc.loss(lambda x, t: denoise(params, x, t), key, x0)

    val, grad = jax.jit(jax.value_and_grad(loss_fn))(w, jax.random.PRNGKey(2))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0


def test_so3_p_sample_loop_scan_runs():
    proc = SO3Diffusion.create(20)  # tiny T for speed

    def denoise(x, t):
        return jnp.zeros((x.shape[0], 3))

    out = jax.jit(lambda k: proc.p_sample_loop(denoise, k, (8,)))(
        jax.random.PRNGKey(0)
    )
    assert out.shape == (8, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3), out.shape)
    ortho = jnp.matmul(
        out, jnp.swapaxes(out, -1, -2), precision=jax.lax.Precision.HIGHEST
    )
    np.testing.assert_allclose(ortho, eye, atol=1e-4)


def test_so3_p_sample_loop_zero_denoiser_converges_to_identityish():
    """With a perfect-zero denoiser the chain contracts toward small angles
    (posterior mean pulls x toward x_recon = x_t-scaled state)."""
    proc = SO3Diffusion.create(100)

    def denoise(x, t):
        return jnp.zeros((x.shape[0], 3))

    out = jax.jit(lambda k: proc.p_sample_loop(denoise, k, (64,)))(
        jax.random.PRNGKey(3)
    )
    assert np.isfinite(np.asarray(out)).all()


def test_so3_p_sample_loop_trajectory():
    proc = SO3Diffusion.create(15)

    def denoise(x, t):
        return jnp.zeros((x.shape[0], 3))

    x, traj = proc.p_sample_loop(
        denoise, jax.random.PRNGKey(0), (4,), return_trajectory=True
    )
    assert x.shape == (4, 3, 3)
    assert traj.shape == (15, 4, 3, 3)
    # traj index = timestep: traj[T-1] is the chain's initial state
    assert np.isfinite(np.asarray(traj)).all()


def test_se3_loss_and_sample_loop():
    proc = SE3Diffusion.create(20, shift_scale=75.0)

    def denoise(x, t):
        b = x.shift.shape[0]
        return se3_ops.AffineGrad(jnp.zeros((b, 3)), jnp.zeros((b, 3)))

    x0 = se3_ops.AffineT.identity((16,))
    val = jax.jit(lambda k: proc.loss(denoise, k, x0))(jax.random.PRNGKey(0))
    assert np.isfinite(float(val))
    out = jax.jit(lambda k: proc.p_sample_loop(denoise, k, (8,)))(
        jax.random.PRNGKey(1)
    )
    assert out.rot.shape == (8, 3, 3)
    assert out.shift.shape == (8, 3)
    assert np.isfinite(np.asarray(out.shift)).all()


def test_se3_oracle_sampler_contracts():
    """With the oracle denoiser for a delta at the identity transform, the
    SE(3) reverse chain must contract BOTH components (this is the test
    that catches the reference's missing shift_scale in
    predict_start_from_noise — with that bug shifts random-walk to ~1e5)."""
    proc = SE3Diffusion.create(200, shift_scale=75.0)
    sched = proc.schedule

    def oracle(x, t):
        eps = sched.sqrt_one_minus_alphas_cumprod[t][..., None]
        rot_g = so3_ops.log_rmat_vec(x.rot) / eps
        shift_g = x.shift / (eps * proc.shift_scale)
        return se3_ops.AffineGrad(rot_g, shift_g)

    out = jax.jit(lambda k: proc.p_sample_loop(oracle, k, (64,)))(
        jax.random.PRNGKey(0)
    )
    ang = np.asarray(so3_ops.rotation_angle(out.rot))
    shift_norm = np.linalg.norm(np.asarray(out.shift), axis=-1)
    assert ang.max() < 0.2, ang.max()
    assert shift_norm.max() < 10.0, shift_norm.max()  # noise floor ~ eps_0*75


def test_euler_process():
    proc = ProjectedEulerDiffusion.create(20)

    def denoise(x, t):
        return jnp.zeros_like(x)

    x0 = jnp.zeros((16, 6))
    val = jax.jit(lambda k: proc.loss(denoise, k, x0))(jax.random.PRNGKey(0))
    assert np.isfinite(float(val))
    out = jax.jit(lambda k: proc.p_sample_loop(denoise, k, (8, 6)))(
        jax.random.PRNGKey(1)
    )
    assert out.shape == (8, 6)


def test_projection_hook_is_used():
    proc = ProjectedGaussianDiffusion(timesteps=50)
    seen = []

    def projection(x):
        return x * 2.0  # marker transformation

    def denoise(x_in, t):
        return x_in * 0.0

    x0 = jnp.ones((4, 3))
    l_with = proc.loss(denoise, jax.random.PRNGKey(0), x0, projection=projection)
    assert np.isfinite(float(l_with))


def test_gaussian_sample_loop():
    proc = GaussianDiffusion.create(20)

    def denoise(x, t):
        return jnp.zeros_like(x)

    out = jax.jit(lambda k: proc.p_sample_loop(denoise, k, (8, 3)))(
        jax.random.PRNGKey(0)
    )
    assert out.shape == (8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_invalid_loss_type_raises():
    with pytest.raises(ValueError):
        SO3Diffusion.create(10, loss_type="bogus")
    with pytest.raises(ValueError):
        SE3Diffusion.create(10, loss_type="bogus")
    with pytest.raises(ValueError):
        GaussianDiffusion.create(10, loss_type="bogus")


def test_se3_clip_shift_bounds_adversarial_chain():
    """clip_shift makes shift divergence structurally impossible: even an
    adversarial denoiser that always predicts large constant noise cannot
    blow up the reverse chain, while the unclipped (reference-parity)
    process random-walks orders of magnitude further."""
    from diffusion_extensions_tpu.ops.se3 import AffineGrad
    from diffusion_extensions_tpu.processes.se3 import ProjectedSE3Diffusion

    def adversary(x, t):
        b = x.shift.shape[0]
        return AffineGrad(jnp.zeros((b, 3)), jnp.full((b, 3), 5.0))

    key = jax.random.PRNGKey(0)
    clipped = ProjectedSE3Diffusion(timesteps=50, clip_shift=75.0)
    out_c = jax.jit(lambda k: clipped.p_sample_loop(adversary, k, (16,)))(key)
    norm_c = np.linalg.norm(np.asarray(out_c.shift), axis=-1)
    assert np.isfinite(norm_c).all()
    assert norm_c.max() < 500.0, norm_c.max()

    unclipped = ProjectedSE3Diffusion(timesteps=50, clip_shift=0.0)
    out_u = jax.jit(lambda k: unclipped.p_sample_loop(adversary, k, (16,)))(key)
    norm_u = np.linalg.norm(np.asarray(out_u.shift), axis=-1)
    assert norm_u.max() > 10 * norm_c.max()
