"""Shared model building blocks (reference: ``models.py:13-182``), flax.linen.

The transformer encoder reproduces PyTorch-1.8 ``nn.TransformerEncoderLayer``
semantics (post-LayerNorm, ReLU, d_ff=2048 default, dropout 0.1) that the
reference relies on (``models.py:170-192``), but batch-first and with masks
expressed as boolean attend-weights (no batch/sequence transpose dance —
``models.py:177-182`` exists only because PT 1.8 lacked batch_first).
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "SinusoidalPosEmb",
    "Siren",
    "ResLayer",
    "ResMLPBlock",
    "PoolRN",
    "PoolPos",
    "TransformerEncoderLayer",
    "TransformerCrossLayer",
    "TransformerEncoder",
]


class SinusoidalPosEmb(nn.Module):
    """Sin/cos timestep embedding (reference: ``models.py:13-25``)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = x.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate((jnp.sin(emb), jnp.cos(emb)), axis=-1)


def _siren_kernel_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        in_channels = shape[0]
        bound = (6.0 / in_channels) ** 0.5
        return scale * jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


def _siren_bias_init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-3.14159, maxval=3.14159)


class Siren(nn.Module):
    """Sin-activated linear layer with SIREN init (reference:
    ``models.py:37-72``): weights ~ U(+-sqrt(6/in)) * scale, bias ~ U(+-pi),
    optional post-linear."""

    out_channels: int
    scale: float = 1.0
    post_scale: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        res = jnp.sin(
            nn.Dense(
                self.out_channels,
                kernel_init=_siren_kernel_init(self.scale),
                bias_init=_siren_bias_init,
            )(x)
        )
        if self.post_scale:
            return nn.Dense(self.out_channels)(res)
        return res


class ResLayer(nn.Module):
    """x + f(x) (reference: ``models.py:28-34``)."""

    layer: Callable

    @nn.compact
    def __call__(self, x):
        return x + self.layer(x)


class ResMLPBlock(nn.Module):
    """Residual Linear+SiLU block, the reference's
    ``ResLayer(Sequential(Linear, SiLU))`` idiom."""

    dim: int

    @nn.compact
    def __call__(self, x):
        return x + nn.silu(nn.Dense(self.dim)(x))


class PoolRN(nn.Module):
    """Sigmoid-gated weighted mean pooling of features
    (reference: ``models.py:94-110``)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        if mask is None:
            mask = jnp.ones(x.shape[:-1], dtype=bool)
        weight = nn.sigmoid(nn.Dense(1)(x)) * mask[..., None].astype(x.dtype)
        w_sum = jnp.maximum(jnp.sum(weight, axis=-2), 1e-6)
        val = nn.Dense(self.dim)(x)
        return jnp.sum(val * weight, axis=-2) / w_sum


class PoolPos(nn.Module):
    """Sigmoid-gated weighted mean pooling of positions
    (reference: ``models.py:113-127``)."""

    @nn.compact
    def __call__(self, x: jax.Array, pos: jax.Array, mask: Optional[jax.Array] = None):
        if mask is None:
            mask = jnp.ones(x.shape[:-1], dtype=bool)
        weight = nn.sigmoid(nn.Dense(1)(x)) * mask[..., None].astype(x.dtype)
        w_sum = jnp.maximum(jnp.sum(weight, axis=-2), 1e-6)
        return jnp.sum(pos * weight, axis=-2) / w_sum


class PoolFrame(nn.Module):
    """Sigmoid-gated weighted mean pooling of per-residue FRAME matrices —
    the orientation analogue of ``PoolPos`` (beyond-reference; no
    counterpart in ``models.py``).

    Motivation (measured, BENCHMARKS.md protein section): the reference
    readout pools features (``PoolRN``) and positions (``PoolPos``) only.
    A weighted *mean position* is invariant to the centroid-centred
    rotations the SE(3) diffusion applies to the ligand, so the rotation
    block of the docking transform is observable only through the feature
    mean — and the trained reference-parity model measures at the
    zero-predictor baseline for rotation at every timestep.  Pooling the
    frames gives the head a direct, linearly-decodable orientation
    readout: each gate head produces a gated average of the (3, 3) frame
    rows, which transforms with the applied rotation.
    """

    heads: int = 4

    @nn.compact
    def __call__(
        self, x: jax.Array, frames: jax.Array, mask: Optional[jax.Array] = None
    ):
        # x: (B, L, D) features; frames: (B, L, 3, 3) -> (B, heads * 9)
        if mask is None:
            mask = jnp.ones(x.shape[:-1], dtype=bool)
        w = nn.sigmoid(nn.Dense(self.heads)(x)) * mask[..., None].astype(x.dtype)
        w_sum = jnp.maximum(jnp.sum(w, axis=-2), 1e-6)  # (B, heads)
        f = frames.reshape(*frames.shape[:-2], 9)  # (B, L, 9)
        pooled = jnp.einsum("...lh,...lf->...hf", w, f) / w_sum[..., None]
        return pooled.reshape(*pooled.shape[:-2], self.heads * 9)


class FusedSelfAttention(nn.Module):
    """Self-attention with one fused QKV matmul.

    At the reference's model sizes (dim 512, 256 tokens) the three separate
    q/k/v projections of ``nn.MultiHeadDotProductAttention`` leave the MXU
    underfed; fusing them into a single (dim, 3*dim) matmul plus one
    softmax(QK^T)V is the standard small-model TPU layout.
    """

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, s, _ = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, s, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, S, H, D)
        scale = 1.0 / math.sqrt(head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.asarray(-1e9, logits.dtype))
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(b, s, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(out)


class TransformerEncoderLayer(nn.Module):
    """PyTorch-1.8-semantics encoder layer: post-norm, ReLU FFN.

    Attention implementation chosen by measurement on TPU v5e (full
    train-step throughput, batch 32 x 256 tokens x d512): flax
    MultiHeadDotProductAttention at bf16 with f32 LayerNorms won at
    174.5 steps/s vs 164.0 (fused-QKV) and 128.4 (jax.nn
    dot_product_attention); ``fused_qkv=True`` selects the fused variant
    for configurations where it measures faster.
    """

    dim: int
    heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fused_qkv: bool = False
    moe_experts: int = 0  # >0: Switch MoE FFN with this many experts
    moe_dispatch: str = "onehot"  # MoEFFN.dispatch_impl ("onehot"/"scatter")

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        if self.fused_qkv:
            attn = FusedSelfAttention(self.dim, self.heads, dtype=self.dtype)(
                x.astype(self.dtype), mask=mask
            )
        else:
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.heads,
                qkv_features=self.dim,
                out_features=self.dim,
                dropout_rate=self.dropout,
                dtype=self.dtype,
            )(x, x, mask=mask, deterministic=deterministic)
        if self.dropout > 0.0:
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-5)(x + attn)
        if self.moe_experts > 0:
            from .moe import MoEFFN

            h = MoEFFN(
                self.dim,
                self.moe_experts,
                self.dim_feedforward,
                dropout=self.dropout,
                dtype=self.dtype,
                dispatch_impl=self.moe_dispatch,
            )(x, deterministic=deterministic)
        else:
            h = nn.relu(nn.Dense(self.dim_feedforward, dtype=self.dtype)(x))
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Dense(self.dim, dtype=self.dtype)(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = nn.LayerNorm(epsilon=1e-5)(x + h)
        return x


class TransformerCrossLayer(nn.Module):
    """Post-norm cross-attention block: ``x`` queries attend to ``ctx``
    keys/values, then a ReLU FFN — the cross-chain counterpart of
    ``TransformerEncoderLayer`` (same PyTorch-1.8 post-norm conventions).

    Beyond-reference: the reference encodes receptor and ligand with
    *independent* self-attention stacks and only lets them interact through
    pooled summary vectors (``models.py:277-319``).  The measured
    consequence (BENCHMARKS.md protein section) is that the rotation block
    of the docking transform — a *bilinear* comparison between ligand and
    receptor orientations — sits at the zero-predictor under the
    reference's Haar-augmented protocol.  Cross-attention gives every
    ligand token direct access to receptor tokens (and vice versa), making
    that comparison representable before the pooling bottleneck.
    """

    dim: int
    heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, ctx_mask=None, deterministic: bool = True):
        mask = None
        if ctx_mask is not None:
            # (B, 1, 1, Lctx) — broadcast over heads and query positions
            mask = ctx_mask[:, None, None, :]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.dim,
            out_features=self.dim,
            dropout_rate=self.dropout,
            dtype=self.dtype,
        )(x, ctx, mask=mask, deterministic=deterministic)
        if self.dropout > 0.0:
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-5)(x + attn)
        h = nn.relu(nn.Dense(self.dim_feedforward, dtype=self.dtype)(x))
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=1e-5)(x + h).astype(jnp.float32)


class TransformerEncoder(nn.Module):
    """Stack of encoder layers, optional final LayerNorm (reference
    ``TransformerEnc2`` uses one, ``models.py:170-182``; ``PlaneNet``'s
    stack does not, ``models.py:190-192``).

    ``key_padding_mask``: boolean (B, L), True = valid token (note: the
    *inverse* of PyTorch's src_key_padding_mask convention, which the
    reference has to ``logical_not`` at every call site,
    ``models.py:290,308``).

    ``attn_mask``: full boolean attention mask broadcastable to
    (B, heads, Lq, Lk), True = attend.  Overrides ``key_padding_mask``;
    used to run several independent sequences through ONE encoder call
    with a block-diagonal mask (ProtNet's fused receptor+ligand pass).

    ``dtype``: activation dtype for the attention/FFN matmuls — pass
    jnp.bfloat16 to run the MXU-heavy path in bf16 (LayerNorms and the
    residual stream stay float32).
    """

    dim: int
    heads: int
    layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    final_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_qkv: bool = False
    moe_experts: int = 0
    moe_dispatch: str = "onehot"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True,
                 attn_mask=None):
        mask = None
        if attn_mask is not None:
            mask = attn_mask
        elif key_padding_mask is not None:
            # (B, 1, 1, L) — broadcast over heads and query positions.
            mask = key_padding_mask[:, None, None, :]
        for _ in range(self.layers):
            x = TransformerEncoderLayer(
                self.dim,
                self.heads,
                self.dim_feedforward,
                self.dropout,
                dtype=self.dtype,
                fused_qkv=self.fused_qkv,
                moe_experts=self.moe_experts,
                moe_dispatch=self.moe_dispatch,
            )(x, mask=mask, deterministic=deterministic)
        if self.final_norm:
            x = nn.LayerNorm(epsilon=1e-5)(x)
        return x.astype(jnp.float32)
