"""Point-cloud denoiser for the aircraft alignment experiment
(reference ``PlaneNet``, ``models.py:185-210``) — the flagship/benchmark
model (north-star metric: aircraft_rotate train steps/sec/chip).

TPU notes: the whole forward is three dense blocks + a 4-layer, 256-token
transformer — all MXU work.  ``dtype=bfloat16`` runs attention/FFN matmuls
in bf16 (the TPU-native fast path) while keeping LayerNorm, the Siren
embedding, and the head in float32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import PoolRN, Siren, SinusoidalPosEmb, TransformerEncoder

__all__ = ["PlaneNet"]


class PlaneNet(nn.Module):
    """x: (B, N, 3) projected point cloud, t: (B,) timesteps ->
    (B, 3) skew-vec noise prediction."""

    dim: int = 512
    heads: int = 4
    layers: int = 4
    dropout: float = 0.0
    bf16: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, deterministic: bool = True):
        x_emb = Siren(self.dim // 2, scale=30)(x)  # (B, N, dim/2)
        t_emb = SinusoidalPosEmb(self.dim // 2)(t)  # (B, dim/2)
        t_tok = jnp.broadcast_to(t_emb[:, None, :], x_emb.shape)
        h = jnp.concatenate((x_emb, t_tok), axis=-1)  # (B, N, dim)
        h = TransformerEncoder(
            self.dim,
            self.heads,
            self.layers,
            dropout=self.dropout,
            final_norm=False,
            dtype=jnp.bfloat16 if self.bf16 else jnp.float32,
        )(h, deterministic=deterministic)
        h = h.astype(jnp.float32)
        pooled = PoolRN(self.dim)(h)  # (B, dim)
        return nn.Dense(3)(pooled)
