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

from .layers import (
    PoolRN,
    Siren,
    SinusoidalPosEmb,
    TransformerEncoder,
    TransformerEncoderLayer,
)

__all__ = ["PlaneNet", "planenet_pp_params", "planenet_pp_apply"]


class PlaneNet(nn.Module):
    """x: (B, N, 3) projected point cloud, t: (B,) timesteps ->
    (B, 3) skew-vec noise prediction."""

    dim: int = 512
    heads: int = 4
    layers: int = 4
    dropout: float = 0.0
    bf16: bool = False
    moe_experts: int = 0  # >0: Switch MoE FFN (ep-shardable, models/moe.py)
    moe_dispatch: str = "scatter"  # MoEFFN.dispatch_impl; scatter = measured winner

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
            moe_experts=self.moe_experts,
            moe_dispatch=self.moe_dispatch,
        )(h, deterministic=deterministic)
        h = h.astype(jnp.float32)
        pooled = PoolRN(self.dim)(h)  # (B, dim)
        return nn.Dense(3)(pooled)


def planenet_pp_params(params, mesh, pp_axis: str = "pp"):
    """Re-lay a trained PlaneNet param tree for pipeline parallelism: the
    encoder layers are stacked on a leading layer dim and sharded over the
    pp axis (each stage holds L/P layers at rest); embed/head stay as-is
    (replicated).  Inverse-free: ``planenet_pp_apply`` consumes this layout
    directly.
    """
    from ..parallel.pp import shard_stacked_params, stack_layer_params

    p = params["params"]
    enc = p["TransformerEncoder_0"]
    n_layers = len(enc)
    stacked = stack_layer_params(
        [enc[f"TransformerEncoderLayer_{i}"] for i in range(n_layers)]
    )
    return {
        "embed": {"Siren_0": p["Siren_0"]},
        "layers": shard_stacked_params(stacked, mesh, pp_axis),
        "head": {"PoolRN_0": p["PoolRN_0"], "Dense_0": p["Dense_0"]},
    }


def planenet_pp_apply(
    model: PlaneNet,
    pp_params,
    x: jax.Array,
    t: jax.Array,
    mesh,
    n_microbatches: int,
    pp_axis: str = "pp",
):
    """PlaneNet forward with the encoder stack run through the GPipe
    microbatch pipeline (``parallel.pp``): embed and head run replicated
    (they are a few percent of the FLOPs); the L identical encoder layers
    — where the model's depth lives — run split over P pipeline stages.
    Numerically identical to ``model.apply`` (asserted by
    ``tests/test_pp.py``).

    With ``model.moe_experts > 0`` (Switch MoE FFN layers) the return is
    ``(pred, aux)``: each stage pulls its layers' sown load-balance losses
    through the pipeline (``pipeline_apply(layer_has_aux=True)``), summed
    over layers and averaged over microbatches — add ``aux_weight * aux``
    to the training loss exactly as the dense-apply path does
    (``experiments/aircraft.py`` loss_fn).
    """
    from ..parallel.pp import pipeline_apply

    moe = model.moe_experts > 0
    dtype = jnp.bfloat16 if model.bf16 else jnp.float32
    emb = Siren(model.dim // 2, scale=30)
    x_emb = emb.apply({"params": pp_params["embed"]["Siren_0"]}, x)
    t_emb = SinusoidalPosEmb(model.dim // 2).apply({}, t)
    t_tok = jnp.broadcast_to(t_emb[:, None, :], x_emb.shape)
    h = jnp.concatenate((x_emb, t_tok), axis=-1)

    # derive the layer config from the same defaults PlaneNet's encoder
    # uses (dataclass field default, not a duplicated literal)
    template = TransformerEncoderLayer(
        model.dim,
        model.heads,
        TransformerEncoder.dim_feedforward,
        model.dropout,
        dtype=dtype,
        moe_experts=model.moe_experts,
        moe_dispatch=model.moe_dispatch,
    )

    if moe:

        def layer_fn(p_l, h):
            out, st = template.apply({"params": p_l}, h, mutable=["losses"])
            return out, sum(jax.tree_util.tree_leaves(st["losses"]))

        h, aux = pipeline_apply(
            layer_fn, pp_params["layers"], h, mesh, n_microbatches,
            pp_axis, layer_has_aux=True,
        )
    else:

        def layer_fn(p_l, h):
            return template.apply({"params": p_l}, h)

        h = pipeline_apply(
            layer_fn, pp_params["layers"], h, mesh, n_microbatches, pp_axis
        )
    h = h.astype(jnp.float32)
    pooled = PoolRN(model.dim).apply(
        {"params": pp_params["head"]["PoolRN_0"]}, h
    )
    pred = nn.Dense(3).apply({"params": pp_params["head"]["Dense_0"]}, pooled)
    return (pred, aux) if moe else pred
