"""Euclidean DDPM process (reference ``GaussianDiffusion`` /
``ProjectedGaussianDiffusion``, ``diffusion.py:41-277``) as a pure-functional
pytree: no module state, no per-batch attribute mutation — the "projected"
conditioning (``self.projection = projection``, ``diffusion.py:273-277``)
becomes an explicit callable argument closed over the batch data, and the
reverse sampler is a single ``lax.scan`` instead of a 1000-iteration Python
loop (``diffusion.py:134-142``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .schedule import Schedule, extract

__all__ = ["GaussianDiffusion", "ProjectedGaussianDiffusion"]


@struct.dataclass
class GaussianDiffusion:
    """DDPM on R^n.  ``denoise_fn(x_in, t) -> eps_hat`` is passed per call
    (it closes over model params so the whole method chain jits/grads).

    ``projection``: optional callable applied to the state before the
    denoiser — the reference's Projected* conditioning hook.  When None the
    denoiser sees the raw state.
    """

    schedule: Schedule
    loss_type: str = struct.field(pytree_node=False, default="l2")
    clip_denoised_default: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, timesteps: int = 1000, loss_type: str = "l2", betas=None):
        if loss_type not in ("l1", "l2"):
            raise ValueError(f"Unexpected loss_type: {loss_type}")
        return cls(schedule=Schedule.create(timesteps, betas), loss_type=loss_type)

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    # -- forward process -------------------------------------------------
    def q_mean_variance(self, x_start, t):
        """(reference: ``diffusion.py:94-98``)"""
        nd = x_start.ndim - t.ndim
        s = self.schedule
        mean = extract(s.sqrt_alphas_cumprod, t, nd) * x_start
        variance = extract(1.0 - s.alphas_cumprod, t, nd)
        log_variance = extract(s.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """(reference: ``diffusion.py:166-172``)"""
        nd = x_start.ndim - t.ndim
        s = self.schedule
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def predict_start_from_noise(self, x_t, t, noise):
        """(reference: ``diffusion.py:100-104``)"""
        nd = x_t.ndim - t.ndim
        s = self.schedule
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def q_posterior(self, x_start, x_t, t):
        """(reference: ``diffusion.py:106-113``)"""
        nd = x_t.ndim - t.ndim
        s = self.schedule
        posterior_mean = (
            extract(s.posterior_mean_coef1, t, nd) * x_start
            + extract(s.posterior_mean_coef2, t, nd) * x_t
        )
        posterior_variance = extract(s.posterior_variance, t, nd)
        posterior_log_variance = extract(s.posterior_log_variance_clipped, t, nd)
        return posterior_mean, posterior_variance, posterior_log_variance

    # -- reverse process -------------------------------------------------
    def p_mean_variance(self, denoise_fn, x, t, clip_denoised, projection=None):
        """(reference: ``diffusion.py:115-122`` / projected ``:200-208``)"""
        x_in = projection(x) if projection is not None else x
        x_recon = self.predict_start_from_noise(x, t, denoise_fn(x_in, t))
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        return self.q_posterior(x_recon, x, t)

    def p_sample(self, denoise_fn, key, x, t, clip_denoised=None, projection=None):
        """One ancestral step; no noise at t == 0
        (reference: ``diffusion.py:124-131``)."""
        if clip_denoised is None:
            clip_denoised = self.clip_denoised_default
        mean, _, log_var = self.p_mean_variance(
            denoise_fn, x, t, clip_denoised, projection
        )
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        nd = x.ndim - t.ndim
        nonzero = 1.0 - (t == 0).astype(x.dtype).reshape(*t.shape, *((1,) * nd))
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def p_sample_loop(
        self, denoise_fn, key, shape, clip_denoised=None, projection=None,
        x_init=None,
    ):
        """Full reverse chain as ``lax.scan`` from Gaussian init
        (reference: ``diffusion.py:133-142``).  ``x_init`` overrides the
        initial state (e.g. euler decompositions of Haar rotations, the
        reference's lock/aircraft euler-test inits,
        ``euler_lock_test.py:22-24``, ``aircraft_test.py:80-83``)."""
        b = shape[0]
        key, init_key = jax.random.split(key)
        x0 = jax.random.normal(init_key, shape) if x_init is None else x_init

        def step(x, i):
            t = jnp.full((b,), i, dtype=jnp.int32)
            k = jax.random.fold_in(key, i)
            return (
                self.p_sample(denoise_fn, k, x, t, clip_denoised, projection),
                None,
            )

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
        """Deterministic DDIM sampling (Song et al. 2021, eta = 0) — an
        accelerated alternative to the 1000-step ancestral chain; not in the
        reference."""
        if clip_denoised is None:
            clip_denoised = self.clip_denoised_default
        b = shape[0]
        key, init_key = jax.random.split(key)
        x0 = jax.random.normal(init_key, shape)
        T = self.num_timesteps
        ts = jnp.linspace(T - 1, 0, num_steps + 1).round().astype(jnp.int32)
        s = self.schedule

        def step(x, i):
            t = jnp.full((b,), ts[i], dtype=jnp.int32)
            t_prev = jnp.full((b,), ts[i + 1], dtype=jnp.int32)
            return (
                self._ddim_map(denoise_fn, x, t, t_prev, clip_denoised,
                               projection),
                None,
            )

        x, _ = jax.lax.scan(step, x0, jnp.arange(num_steps))
        # final step: map to the clean x0 prediction (acp_{-1} = 1)
        t0 = jnp.zeros((b,), dtype=jnp.int32)
        x_in = projection(x) if projection is not None else x
        x = self.predict_start_from_noise(x, t0, denoise_fn(x_in, t0))
        if clip_denoised:
            x = jnp.clip(x, -1.0, 1.0)
        return x

    def _ddim_map(self, denoise_fn, x, t, t_prev, clip_denoised,
                  projection=None):
        """One deterministic DDIM step x_t -> x_{t_prev} (batched over any
        leading dims).  Shared by the sequential loop and the Picard
        parallel-in-time sampler."""
        s = self.schedule
        b = x.shape[0]
        nd = x.ndim - 1
        x_in = projection(x) if projection is not None else x
        eps_pred = denoise_fn(x_in, t)
        x_recon = self.predict_start_from_noise(x, t, eps_pred)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        x_prev = (
            extract(s.sqrt_alphas_cumprod, t_prev, nd) * x_recon
            + extract(s.sqrt_one_minus_alphas_cumprod, t_prev, nd) * eps_pred
        )
        return jnp.where(
            (t_prev == t).reshape(b, *((1,) * nd)), x_recon, x_prev
        )

    def parallel_sample_loop(
        self,
        denoise_fn,
        key,
        shape,
        num_steps: int = 50,
        tol: float = 1e-4,
        max_sweeps: int | None = None,
        clip_denoised=None,
        projection=None,
        return_sweeps: bool = False,
    ):
        """Parallel-in-time (Picard / ParaDiGMS, arXiv:2305.16317) DDIM:
        each sweep is ONE time-batched model eval over all S grid points;
        the trajectory is rebuilt from additive increments by prefix sums.
        Fixed point == the sequential ``ddim_sample_loop``
        (``tests/test_parallel_sampler.py``); converges in K < S sweeps.
        """
        if clip_denoised is None:
            clip_denoised = self.clip_denoised_default
        b = shape[0]
        key, init_key = jax.random.split(key)
        x0 = jax.random.normal(init_key, shape)
        T = self.num_timesteps
        ts = jnp.linspace(T - 1, 0, num_steps + 1).round().astype(jnp.int32)
        S = num_steps
        if max_sweeps is None:
            max_sweeps = S
        t_cur = jnp.broadcast_to(ts[:-1, None], (S, b))
        t_prev = jnp.broadcast_to(ts[1:, None], (S, b))

        def sweep(X):
            xn = self._ddim_map(
                denoise_fn,
                X[:-1].reshape((S * b,) + shape[1:]),
                t_cur.reshape(S * b),
                t_prev.reshape(S * b),
                clip_denoised,
                projection,
            ).reshape((S,) + shape)
            dx = xn - X[:-1]
            Xnew = jnp.concatenate(
                [x0[None], x0[None] + jnp.cumsum(dx, axis=0)], axis=0
            )
            mag = 1.0 + jnp.max(jnp.abs(X))
            return Xnew, jnp.max(jnp.abs(Xnew - X)) / mag

        X0 = jnp.broadcast_to(x0[None], (S + 1,) + shape)

        def cond(carry):
            _, diff, k = carry
            return jnp.logical_and(diff > tol, k < max_sweeps)

        def body(carry):
            X, _, k = carry
            Xnew, diff = sweep(X)
            return Xnew, diff, k + 1

        X, _, k = jax.lax.while_loop(
            cond, body, (X0, jnp.asarray(jnp.inf, jnp.float32), 0)
        )
        x = X[-1]
        t0 = jnp.zeros((b,), dtype=jnp.int32)
        x_in = projection(x) if projection is not None else x
        x = self.predict_start_from_noise(x, t0, denoise_fn(x_in, t0))
        if clip_denoised:
            x = jnp.clip(x, -1.0, 1.0)
        return (x, k) if return_sweeps else x

    def interpolate(self, denoise_fn, key, x1, x2, t=None, lam=0.5):
        """Latent-space interpolation (reference: ``diffusion.py:150-164``)."""
        b = x1.shape[0]
        t = self.num_timesteps - 1 if t is None else t
        key, k1, k2 = jax.random.split(key, 3)
        tb = jnp.full((b,), t, dtype=jnp.int32)
        xt1 = self.q_sample(x1, tb, jax.random.normal(k1, x1.shape))
        xt2 = self.q_sample(x2, tb, jax.random.normal(k2, x2.shape))
        img = (1 - lam) * xt1 + lam * xt2

        def step(x, i):
            ti = jnp.full((b,), i, dtype=jnp.int32)
            k = jax.random.fold_in(key, i)
            return self.p_sample(denoise_fn, k, x, ti), None

        steps = jnp.arange(t - 1, -1, -1)
        img, _ = jax.lax.scan(step, img, steps)
        return img

    # -- training --------------------------------------------------------
    def p_losses(self, denoise_fn, x_start, t, noise, projection=None):
        """(reference: ``diffusion.py:174-187`` / projected ``:257-271``)"""
        x_noisy = self.q_sample(x_start, t, noise)
        x_in = projection(x_noisy) if projection is not None else x_noisy
        x_recon = denoise_fn(x_in, t)
        if self.loss_type == "l1":
            return jnp.mean(jnp.abs(noise - x_recon))
        elif self.loss_type == "l2":
            return jnp.mean((noise - x_recon) ** 2)
        raise ValueError(f"Unexpected loss_type: {self.loss_type}")

    def loss(self, denoise_fn, key, x_start, projection=None):
        """Uniform-random t + p_losses (= reference ``forward``,
        ``diffusion.py:189-193``)."""
        b = x_start.shape[0]
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(k_n, x_start.shape, dtype=x_start.dtype)
        return self.p_losses(denoise_fn, x_start, t, noise, projection)


def ProjectedGaussianDiffusion(
    timesteps: int = 1000, loss_type: str = "l1", betas=None
) -> GaussianDiffusion:
    """Factory matching the reference subclass defaults
    (``diffusion.py:196-198``: loss l1, no clipping during sampling).
    Pass ``projection=`` to the loss/sampling methods."""
    if loss_type not in ("l1", "l2"):
        raise ValueError(f"Unexpected loss_type: {loss_type}")
    return GaussianDiffusion(
        schedule=Schedule.create(timesteps, betas),
        loss_type=loss_type,
        clip_denoised_default=False,
    )
