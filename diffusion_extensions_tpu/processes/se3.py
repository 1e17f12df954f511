"""DDPM on SE(3) = SO(3) x R^3 (reference ``SE3Diffusion`` /
``ProjectedSE3Diffusion``, ``diffusion.py:432-573``).

The state is an ``AffineT`` pytree; rotation noise comes from the same
precomputed per-timestep IGSO(3) tables as the SO(3) process and shift noise
is Gaussian scaled by ``eps_t * shift_scale`` (reference
``IGSO3xR3(eps, shift_scale=75.0)``, ``diffusion.py:496-507``).

Fixed by construction vs the reference:

* the base-class ``p_sample_loop`` initialises rotation only and crashes on
  the shift (``diffusion.py:485-494``, documented broken); here one
  ``p_sample_loop`` initialises the full AffineT (Haar rotation + unit
  Gaussian shift, matching the working projected-class sampler,
  ``diffusion.py:539-550``),
* loss-type errors actually raise (the reference constructs-but-never-raises
  RuntimeError, ``diffusion.py:515-516,563-564``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.igso3 import IGSO3Table
from ..ops.se3 import AffineGrad, AffineT, se3_scale
from ..ops.so3 import exp_skewvec, haar_rotations, log_rmat_vec, rmul
from .schedule import Schedule, extract

__all__ = ["SE3Diffusion", "ProjectedSE3Diffusion"]


@struct.dataclass
class SE3Diffusion:
    """State = AffineT.  ``denoise_fn(x_in, t) -> AffineGrad`` (tangent
    rot_g/shift_g prediction, loss "grad_mse")."""

    schedule: Schedule
    q_table: IGSO3Table
    p_table: IGSO3Table
    shift_scale: float = struct.field(pytree_node=False, default=75.0)
    loss_type: str = struct.field(pytree_node=False, default="grad_mse")
    projected: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        loss_type: str = "grad_mse",
        betas=None,
        shift_scale: float = 75.0,
        projected: bool = False,
    ) -> "SE3Diffusion":
        if loss_type != "grad_mse":
            raise ValueError(f"Unexpected loss_type: {loss_type}")
        schedule = Schedule.create(timesteps, betas)
        q_eps = np.asarray(schedule.sqrt_one_minus_alphas_cumprod)
        p_sigma = np.asarray(schedule.posterior_stdev)
        return cls(
            schedule=schedule,
            q_table=IGSO3Table.from_eps(q_eps),
            p_table=IGSO3Table.from_eps(np.maximum(p_sigma, 1e-10)),
            shift_scale=shift_scale,
            loss_type=loss_type,
            projected=projected,
        )

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    # -- noise -----------------------------------------------------------
    def sample_noise(self, key, t) -> AffineT:
        """IGSO3xR3(eps_t, shift_scale) via the precomputed table
        (reference: ``diffusion.py:499,507``)."""
        k_rot, k_shift = jax.random.split(key)
        rot = self.q_table.sample(k_rot, t)
        eps = extract(self.schedule.sqrt_one_minus_alphas_cumprod, t, 1)
        shift = eps * self.shift_scale * jax.random.normal(
            k_shift, (*t.shape, 3), dtype=eps.dtype
        )
        return AffineT(rot, shift)

    # -- forward process -------------------------------------------------
    def q_mean_variance(self, x_start: AffineT, t):
        """(reference: ``diffusion.py:438-442``)"""
        s = self.schedule
        mean = se3_scale(x_start, extract(s.sqrt_alphas_cumprod, t))
        return (
            mean,
            extract(1.0 - s.alphas_cumprod, t),
            extract(s.log_one_minus_alphas_cumprod, t),
        )

    def q_sample(self, x_start: AffineT, t, noise: AffineT) -> AffineT:
        """(reference: ``diffusion.py:496-503``): scale then right-compose
        rotation / add shift."""
        scale = extract(self.schedule.sqrt_alphas_cumprod, t)
        x_blend = se3_scale(x_start, scale)
        return AffineT(rmul(x_blend.rot, noise.rot), x_blend.shift + noise.shift)

    def predict_start_from_noise(self, x_t: AffineT, t, noise: AffineGrad):
        """(reference: ``diffusion.py:444-454``)

        Shift algebra: the forward chain adds ``eps_t * shift_scale * z``
        (``q_sample`` + ``sample_noise``) and the model is trained to
        predict the unit ``z`` (``p_losses`` descales by
        ``eps * shift_scale``), so inverting requires
        ``shift_scale * sqrt(1/acp - 1) * z``.  The reference omits the
        ``shift_scale`` factor here (``diffusion.py:446-449``), removing
        only 1/75th of the injected shift noise per reverse step — its
        published SE(3) sampler therefore random-walks to unbounded shifts
        (confirmed empirically; rotations are unaffected).  We use the
        correct factor.
        """
        s = self.schedule
        x_t_term = se3_scale(x_t, extract(s.sqrt_recip_alphas_cumprod, t))
        noise_scale = extract(s.sqrt_recipm1_alphas_cumprod, t, 1)
        noise_rot = exp_skewvec(noise.rot_g * noise_scale)
        noise_shift = noise.shift_g * noise_scale * self.shift_scale
        return AffineT(
            rmul(x_t_term.rot, jnp.swapaxes(noise_rot, -1, -2)),
            x_t_term.shift - noise_shift,
        )

    def q_posterior(self, x_start: AffineT, x_t: AffineT, t):
        """(reference: ``diffusion.py:456-463``)"""
        s = self.schedule
        c1 = se3_scale(x_start, extract(s.posterior_mean_coef1, t))
        c2 = se3_scale(x_t, extract(s.posterior_mean_coef2, t))
        posterior_mean = AffineT(rmul(c1.rot, c2.rot), c1.shift + c2.shift)
        return (
            posterior_mean,
            extract(s.posterior_variance, t),
            extract(s.posterior_log_variance_clipped, t),
        )

    # -- reverse process -------------------------------------------------
    def p_mean_variance(self, denoise_fn, x: AffineT, t, projection=None):
        """(reference: ``diffusion.py:465-470`` / projected ``:531-537``)"""
        x_in = projection(x) if projection is not None else x
        predict = denoise_fn(x_in, t)
        x_recon = self.predict_start_from_noise(x, t, predict)
        return self.q_posterior(x_recon, x, t)

    def p_sample(self, denoise_fn, key, x: AffineT, t, projection=None):
        """(reference: ``diffusion.py:472-483``): sample from
        IGSO3xR3(sigma_t, mean) — rotation right-composed, shift additive;
        frozen (identity/zero noise) at t == 0, scan-safe."""
        mean, _, _ = self.p_mean_variance(denoise_fn, x, t, projection)
        k_rot, k_shift = jax.random.split(key)
        rot_noise = self.p_table.sample(k_rot, t)
        eye = jnp.eye(3, dtype=x.rot.dtype)
        at_zero = (t == 0)[..., None]
        rot_noise = jnp.where(at_zero[..., None], eye, rot_noise)
        sigma = extract(self.schedule.posterior_stdev, t, 1)
        shift_noise = sigma * self.shift_scale * jax.random.normal(
            k_shift, mean.shift.shape, dtype=mean.shift.dtype
        )
        shift_noise = jnp.where(at_zero, 0.0, shift_noise)
        return AffineT(rmul(mean.rot, rot_noise), mean.shift + shift_noise)

    def p_sample_loop(self, denoise_fn, key, shape, projection=None) -> AffineT:
        """Reverse chain as ``lax.scan`` from AffineT(Haar-QR rotation,
        unit-Gaussian shift) — the working projected-class init
        (``diffusion.py:539-550``); the base class's rotation-only init is a
        documented reference bug."""
        if isinstance(shape, int):
            shape = (shape,)
        b = shape[0]
        key, k_rot, k_shift = jax.random.split(key, 3)
        x0 = AffineT(
            haar_rotations(k_rot, (b,)),
            jax.random.normal(k_shift, (b, 3)),
        )

        def step(x, i):
            t = jnp.full((b,), i, dtype=jnp.int32)
            k = jax.random.fold_in(key, i)
            return self.p_sample(denoise_fn, k, x, t, projection), None

        steps = jnp.arange(self.num_timesteps - 1, -1, -1)
        x, _ = jax.lax.scan(step, x0, steps)
        return x

    # -- training --------------------------------------------------------
    def p_losses(self, denoise_fn, key, x_start: AffineT, t, projection=None):
        """grad_mse loss on descaled tangent noise
        (reference: ``diffusion.py:505-517`` / ``:552-566``)."""
        eps = extract(self.schedule.sqrt_one_minus_alphas_cumprod, t, 1)
        noise = jax.lax.stop_gradient(self.sample_noise(key, t))
        x_noisy = self.q_sample(x_start, t, noise)
        x_in = projection(x_noisy) if projection is not None else x_noisy
        x_recon: AffineGrad = denoise_fn(x_in, t)

        descaled_shift = noise.shift / (eps * self.shift_scale)
        descaled_rot = log_rmat_vec(noise.rot) / eps
        loss_shift = jnp.mean((x_recon.shift_g - descaled_shift) ** 2)
        loss_rot = jnp.mean((x_recon.rot_g - descaled_rot) ** 2)
        return loss_shift + loss_rot

    def loss(self, denoise_fn, key, x_start: AffineT, projection=None):
        """(reference ``forward``, ``diffusion.py:519-522,568-573``)"""
        b = len(x_start)
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, self.num_timesteps)
        return self.p_losses(denoise_fn, k_n, x_start, t, projection)


def ProjectedSE3Diffusion(
    timesteps: int = 1000,
    loss_type: str = "grad_mse",
    betas=None,
    shift_scale: float = 75.0,
) -> SE3Diffusion:
    """Factory matching ``diffusion.py:525-529``."""
    return SE3Diffusion.create(
        timesteps, loss_type, betas, shift_scale, projected=True
    )
