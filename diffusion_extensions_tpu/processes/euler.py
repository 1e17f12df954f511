"""Euler-angle + shift baseline process (reference
``ProjectedEulerDiffusion``, ``diffusion.py:575-635``): plain Gaussian DDPM
on a 6-vector state (3 Euler angles, 3 shift) with per-block noise scaling
``rot_scale``/``shift_scale`` applied in losses, sampling steps, and init.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .r3 import GaussianDiffusion
from .schedule import Schedule, extract

__all__ = ["ProjectedEulerDiffusion"]


@struct.dataclass
class ProjectedEulerDiffusion(GaussianDiffusion):
    """State (B, 6) = (euler_xyz, shift).  The denoiser predicts unit-scaled
    noise; the block scales live in the process."""

    rot_scale: float = struct.field(pytree_node=False, default=3.0)
    shift_scale: float = struct.field(pytree_node=False, default=75.0)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        loss_type: str = "grad_mse",
        betas=None,
        rot_scale: float = 3.0,
        shift_scale: float = 75.0,
    ) -> "ProjectedEulerDiffusion":
        if loss_type != "grad_mse":
            raise ValueError(f"Unexpected loss_type: {loss_type}")
        return cls(
            schedule=Schedule.create(timesteps, betas),
            loss_type=loss_type,
            clip_denoised_default=False,
            rot_scale=rot_scale,
            shift_scale=shift_scale,
        )

    def _block_scale(self, dtype=jnp.float32) -> jax.Array:
        return jnp.concatenate(
            [
                jnp.full((3,), self.rot_scale, dtype),
                jnp.full((3,), self.shift_scale, dtype),
            ]
        )

    def p_sample(self, denoise_fn, key, x, t, clip_denoised=None, projection=None):
        """(reference: ``diffusion.py:590-600``): block-scaled noise."""
        mean, _, log_var = self.p_mean_variance(
            denoise_fn, x, t, False, projection
        )
        noise = jax.random.normal(key, x.shape, dtype=x.dtype) * self._block_scale(
            x.dtype
        )
        nonzero = 1.0 - (t == 0).astype(x.dtype)[..., None]
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def p_sample_loop(
        self, denoise_fn, key, shape, clip_denoised=None, projection=None
    ):
        """(reference: ``diffusion.py:602-613``): block-scaled Gaussian init."""
        if isinstance(shape, int):
            shape = (shape, 6)
        b = shape[0]
        key, init_key = jax.random.split(key)
        x0 = jax.random.normal(init_key, (b, 6)) * self._block_scale()

        def step(x, i):
            t = jnp.full((b,), i, dtype=jnp.int32)
            k = jax.random.fold_in(key, i)
            return self.p_sample(denoise_fn, k, x, t, projection=projection), None

        steps = jnp.arange(self.num_timesteps - 1, -1, -1)
        x, _ = jax.lax.scan(step, x0, steps)
        return x

    def ddim_sample_loop(
        self,
        denoise_fn,
        key,
        shape,
        num_steps: int = 50,
        clip_denoised=None,
        projection=None,
    ):
        """DDIM for the euler baseline: the deterministic jumps follow the
        inherited R^n semantics (the reference's euler reverse chain treats
        the model output exactly as the base class's noise estimate), with
        the block-scaled Gaussian *init* of ``p_sample_loop``."""
        if isinstance(shape, int):
            shape = (shape, 6)
        b = shape[0]
        key, init_key = jax.random.split(key)
        x = jax.random.normal(init_key, (b, 6)) * self._block_scale()
        T = self.num_timesteps
        ts = jnp.linspace(T - 1, 0, num_steps + 1).round().astype(jnp.int32)
        s = self.schedule

        def step(x, i):
            t = jnp.full((b,), ts[i], dtype=jnp.int32)
            t_prev = jnp.full((b,), ts[i + 1], dtype=jnp.int32)
            x_in = projection(x) if projection is not None else x
            eps_pred = denoise_fn(x_in, t)
            x_recon = self.predict_start_from_noise(x, t, eps_pred)
            x_prev = (
                extract(s.sqrt_alphas_cumprod, t_prev, 1) * x_recon
                + extract(s.sqrt_one_minus_alphas_cumprod, t_prev, 1) * eps_pred
            )
            x_prev = jnp.where((t_prev == t)[:, None], x_recon, x_prev)
            return x_prev, None

        x, _ = jax.lax.scan(step, x, jnp.arange(num_steps))
        t0 = jnp.zeros((b,), dtype=jnp.int32)
        x_in = projection(x) if projection is not None else x
        return self.predict_start_from_noise(x, t0, denoise_fn(x_in, t0))

    def p_losses(self, denoise_fn, x_start, t, noise, projection=None):
        """(reference: ``diffusion.py:615-628``): the model is trained to
        predict the *descaled* (unit) noise; q_sample sees the scaled one."""
        eps = extract(self.schedule.sqrt_one_minus_alphas_cumprod, t, 1)
        descaled_noise = noise
        scaled = descaled_noise * eps * self._block_scale(noise.dtype)
        # note the reference multiplies by eps here AND q_sample applies
        # sqrt(1-acp) again — faithful reproduction of diffusion.py:619-621.
        x_noisy = self.q_sample(x_start, t, scaled)
        x_in = projection(x_noisy) if projection is not None else x_noisy
        x_recon = denoise_fn(x_in, t)
        return jnp.mean((x_recon - descaled_noise) ** 2)

    def loss(self, denoise_fn, key, x_start, projection=None):
        b = x_start.shape[0]
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(k_n, x_start.shape, dtype=x_start.dtype)
        return self.p_losses(denoise_fn, x_start, t, noise, projection)
