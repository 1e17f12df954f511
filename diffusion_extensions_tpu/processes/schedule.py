"""Diffusion noise schedules as a precomputed pytree of coefficient vectors.

Re-design of the reference's ``nn.Module`` buffer registration
(``/root/reference/diffusion.py:56-92``): one immutable ``Schedule`` struct
holding all eleven coefficient tables, built host-side in float64 and cast
to float32, plus the vendored-helper semantics (``extract``,
``cosine_beta_schedule``) the reference imports from the (empty)
``denoising-diffusion-pytorch`` submodule — reimplemented from the standard
published formulas (``diffusion.py:8-14``; lucidrains'
``cosine_beta_schedule``: clip(1 - acp(t+1)/acp(t), 0.999) with
acp(t) = cos^2(((t/T + s)/(1 + s)) * pi/2), s = 0.008).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["cosine_beta_schedule", "Schedule", "extract"]


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine beta schedule (Nichol & Dhariwal 2021), float64 host-side."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


@struct.dataclass
class Schedule:
    """All DDPM coefficient tables, shape (T,) each
    (reference buffers: ``diffusion.py:72-92``)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @classmethod
    def create(cls, timesteps: int = 1000, betas=None) -> "Schedule":
        if betas is None:
            betas = cosine_beta_schedule(timesteps)
        betas = np.asarray(betas, dtype=np.float64)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        f32 = lambda a: jnp.asarray(np.asarray(a, dtype=np.float32))
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(
                np.log(np.maximum(posterior_variance, 1e-20))
            ),
            posterior_mean_coef1=f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev)
                * np.sqrt(alphas)
                / (1.0 - alphas_cumprod)
            ),
        )

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @property
    def posterior_stdev(self) -> jax.Array:
        """exp(0.5 * posterior_log_variance_clipped) — the reverse-step noise
        scale used by the SO(3)/SE(3) samplers (``diffusion.py:324-325``)."""
        return jnp.exp(0.5 * self.posterior_log_variance_clipped)


def extract(a: jax.Array, t: jax.Array, ndim: int = 0) -> jax.Array:
    """Gather schedule coefficients at timesteps ``t`` and append ``ndim``
    singleton dims so the result broadcasts against a state with ``ndim``
    trailing non-batch dims (vendored helper semantics:
    ``a.gather(-1, t).reshape(b, 1, ..., 1)``).

    Default ``ndim=0`` returns the plain (batch-shaped) gather — the form
    ``so3_scale``/``se3_scale`` consume (they append their own singletons,
    like the reference's ``scalars[..., None, None]``).
    """
    out = a[t]
    return out.reshape(*t.shape, *((1,) * ndim))
