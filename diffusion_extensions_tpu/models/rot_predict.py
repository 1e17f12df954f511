"""MLP rotation denoisers for the toy / lock / bingham experiments
(reference: ``so3_train.py:11-49``, ``so3_lock_train.py:11-59``,
``bingham_train.py:9-47``, ``euler_lock_train.py:11-47``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.so3 import six2rmat
from .layers import ResMLPBlock, SinusoidalPosEmb

__all__ = ["RotPredict", "EulerRotPredict"]


class RotPredict(nn.Module):
    """Rotation-matrix-input denoiser.

    ``variant="mlp"``: 4 hidden Linear+SiLU layers, d_model=65 — the
    ``so3_train.py:11-49`` / ``bingham_train.py:9-47`` model.
    ``variant="resnet"``: 6 residual Linear+SiLU blocks, d_model=255 — the
    ``so3_lock_train.py:11-59`` model.
    ``out_type``: "skewvec" -> (B, 3) tangent prediction, "rotmat" -> 6D ->
    Gram-Schmidt rotation.
    """

    d_model: int = 65
    out_type: str = "skewvec"
    variant: str = "mlp"

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        x_flat = x.reshape(*x.shape[:-2], 9)
        t_emb = SinusoidalPosEmb(self.d_model - 9)(t)
        if t_emb.shape[0] == 1:
            t_emb = jnp.broadcast_to(t_emb, (x_flat.shape[0], t_emb.shape[-1]))
        h = jnp.concatenate((x_flat, t_emb), axis=-1)
        d_out = 3 if self.out_type == "skewvec" else 6
        if self.variant == "mlp":
            for _ in range(4):
                h = nn.silu(nn.Dense(self.d_model)(h))
        elif self.variant == "resnet":
            for _ in range(6):
                h = ResMLPBlock(self.d_model)(h)
        else:
            raise ValueError(f"Unexpected variant: {self.variant}")
        out = nn.Dense(d_out)(h)
        if self.out_type == "rotmat":
            out = six2rmat(out)
        return out


class EulerRotPredict(nn.Module):
    """Euler-angle-input ResNet MLP baseline (reference:
    ``euler_lock_train.py:11-47``): 3-D input, 6 residual blocks, 3-D out."""

    d_model: int = 255

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        t_emb = SinusoidalPosEmb(self.d_model - 3)(t)
        if t_emb.shape[0] == 1:
            t_emb = jnp.broadcast_to(t_emb, (x.shape[0], t_emb.shape[-1]))
        h = jnp.concatenate((x, t_emb), axis=-1)
        for _ in range(6):
            h = ResMLPBlock(self.d_model)(h)
        return nn.Dense(3)(h)
