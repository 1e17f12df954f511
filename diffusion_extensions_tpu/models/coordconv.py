"""Jigsaw-toy convolutional denoiser (reference ``CoordConv``,
``jigsaw_translate.py:61-118``): 7 conv-conv-maxpool stages with ELU over
(image ++ coord grid ++ broadcast time embedding), global mean -> R^2."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import SinusoidalPosEmb

__all__ = ["CoordConv"]


class CoordConv(nn.Module):
    """x: (B, H, W, 3) NHWC image, t: (B,) -> (B, 2).

    NHWC layout (TPU/XLA-native) instead of the reference's NCHW.
    """

    size: int = 128
    dim: int = 16

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        t_emb = SinusoidalPosEmb(self.dim)(t)  # (B, dim)
        lin = jnp.linspace(-1.0, 1.0, self.size)
        gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
        coords = jnp.broadcast_to(
            jnp.stack((gy, gx), axis=-1)[None], (b, h, w, 2)
        )
        t_map = jnp.broadcast_to(t_emb[:, None, None, :], (b, h, w, self.dim))
        h_ = jnp.concatenate((x, coords, t_map), axis=-1)

        def stage(h_, convs):
            for _ in range(convs):
                h_ = nn.elu(nn.Conv(32, kernel_size=(3, 3), padding="SAME")(h_))
            return nn.max_pool(h_, (2, 2), strides=(2, 2))

        h_ = stage(h_, 4)  # reference stage 1 has 4 convs before first pool
        for _ in range(6):
            h_ = stage(h_, 2)
        h_ = nn.Conv(2, kernel_size=(3, 3), padding="SAME")(h_)
        return jnp.mean(h_, axis=(1, 2))
