"""Mixture-of-experts FFN (Switch-Transformer top-1 routing) with
expert-parallel sharding.

Beyond-reference scaling feature (the reference is single-GPU dense,
SURVEY §2.7): swaps a transformer block's dense FFN for E experts whose
stacked parameters ``(E, ...)`` shard over an ``"ep"`` mesh axis —
expert parallelism.  TPU-first design constraints:

* **static shapes**: top-1 routing with a fixed per-expert capacity
  ``C = ceil(T/E * capacity_factor)``; dispatch/combine are one-hot
  einsums (MXU work), never gather/scatter with data-dependent shapes;
* tokens over capacity are dropped (identity residual passes them
  through — standard Switch behaviour);
* the load-balancing auxiliary loss (router entropy control) is sown
  into the ``"losses"`` collection: pull with
  ``model.apply(..., mutable=["losses"])`` and add
  ``aux_weight * load_balance`` to the training loss;
* all-expert einsums are batched over the leading E dim, so GSPMD
  splits them over ``ep`` purely from the param sharding — each device
  computes its experts' FFNs locally, with all-to-alls for the
  dispatched tokens inserted by the partitioner.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MoEFFN", "shard_moe_params"]


class MoEFFN(nn.Module):
    """Top-1 routed mixture of 2-layer FFN experts.

    Input ``(B, N, dim)`` -> output ``(B, N, dim)``.  Matches the dense
    FFN contract of ``TransformerEncoderLayer`` so it can drop in behind
    the same residual+LayerNorm.
    """

    dim: int
    n_experts: int
    dim_feedforward: int = 2048
    capacity_factor: float = 1.25
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # "onehot": dispatch/combine as (T, E, C) one-hot einsums — pure MXU
    #   work, but memory/FLOPs scale O(T^2 * capacity_factor) (see NOTE
    #   below).  "scatter": slot-indexed scatter/gather — O(T*D) traffic,
    #   the right choice for long sequences.  Identical routing semantics
    #   and parameter tree (tests/test_moe.py asserts output parity).
    dispatch_impl: str = "scatter"  # measured 2.8x over "onehot" (BENCHMARKS MoE A/B)

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        b, n, d = x.shape
        t = b * n
        e = self.n_experts
        cap = int(-(-t * self.capacity_factor // e))  # ceil
        tokens = x.reshape(t, d)

        # --- router (f32 for a stable softmax) ---------------------------
        logits = nn.Dense(e, name="router", dtype=jnp.float32)(
            tokens.astype(jnp.float32)
        )
        probs = jax.nn.softmax(logits, axis=-1)  # (T, E)
        gate = jnp.max(probs, axis=-1)  # (T,)
        expert = jnp.argmax(probs, axis=-1)  # (T,)

        # --- load-balance aux loss (Switch eq. 4): E * sum_e f_e * p_e ---
        onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)  # (T, E)
        frac_tokens = onehot.mean(axis=0)
        frac_probs = probs.mean(axis=0)
        self.sow(
            "losses", "load_balance", e * jnp.sum(frac_tokens * frac_probs)
        )
        # per-expert token fractions for load-balance observability
        # (separate collection so the aux-loss sum never picks it up; a
        # plain apply without mutable=["diag"] makes this a no-op)
        self.sow("diag", "expert_frac", frac_tokens)

        # --- capacity-limited dispatch (static shapes) -------------------
        # NOTE memory/FLOPs of the "onehot" (T, E, C) dispatch scale as
        # T * E * C with C = ceil(T * capacity_factor / E), i.e. O(T^2 *
        # capacity_factor) independent of E — at T=8192 that is ~335 MB of
        # f32 per MoE layer and grows quadratically with sequence length.
        # Fine at this repo's scales (aircraft T=8k); for much longer
        # sequences use dispatch_impl="scatter" (O(T*D) slot scatter /
        # gather, same routing semantics).
        # position of each token within its expert's queue
        pos = jnp.cumsum(onehot, axis=0) * onehot  # (T, E), 1-based
        pos = jnp.sum(pos, axis=-1) - 1.0  # (T,), -1 for impossible
        keep = pos < cap  # over-capacity tokens dropped
        pos = jnp.clip(pos, 0, cap - 1).astype(jnp.int32)
        if self.dispatch_impl == "onehot":
            # dispatch: (T, E, C) one-hot; combine adds the gate weight
            dispatch = (
                onehot[:, :, None]
                * jax.nn.one_hot(pos, cap, dtype=jnp.float32)[:, None, :]
                * keep[:, None, None]
            )
            xin = jnp.einsum(
                "tec,td->ecd",
                dispatch.astype(self.dtype),
                tokens.astype(self.dtype),
            )  # (E, C, D)
        elif self.dispatch_impl == "scatter":
            # each kept token owns a unique flat slot expert*cap + pos;
            # dropped tokens get an out-of-range slot and mode="drop"
            slot = jnp.where(
                keep, expert.astype(jnp.int32) * cap + pos, e * cap
            )  # (T,)
            xin = (
                jnp.zeros((e * cap, d), self.dtype)
                .at[slot]
                .set(tokens.astype(self.dtype), mode="drop")
                .reshape(e, cap, d)
            )
        else:
            raise ValueError(
                f"unknown dispatch_impl {self.dispatch_impl!r} "
                "(expected 'onehot' or 'scatter')"
            )
        w1 = self.param(
            "w1",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (e, d, self.dim_feedforward),
            jnp.float32,
        )
        b1 = self.param(
            "b1", nn.initializers.zeros, (e, self.dim_feedforward), jnp.float32
        )
        w2 = self.param(
            "w2",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (e, self.dim_feedforward, d),
            jnp.float32,
        )
        b2 = self.param("b2", nn.initializers.zeros, (e, d), jnp.float32)
        h = jnp.einsum("ecd,edf->ecf", xin, w1.astype(self.dtype))
        h = jax.nn.relu(h + b1[:, None, :].astype(self.dtype))
        if self.dropout > 0.0:
            # mirror the dense FFN's hidden dropout so toggling MoE does
            # not silently change regularization
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = jnp.einsum("ecf,efd->ecd", h, w2.astype(self.dtype))
        h = h + b2[:, None, :].astype(self.dtype)

        if self.dispatch_impl == "onehot":
            combine = dispatch * gate[:, None, None]
            out = jnp.einsum(
                "tec,ecd->td", combine.astype(self.dtype), h
            ).astype(jnp.float32)
        else:
            # gather each token's expert output from its slot; dropped
            # tokens read a clipped slot but are masked to zero (matching
            # the onehot path's zero combine row)
            out = h.reshape(e * cap, d)[jnp.clip(slot, 0, e * cap - 1)]
            out = out.astype(jnp.float32) * (
                gate * keep.astype(jnp.float32)
            )[:, None]
        return out.reshape(b, n, d)


def shard_moe_params(params, mesh: Mesh, ep_axis: str = "ep"):
    """Place every MoE expert-stacked leaf (path contains ``MoEFFN``,
    leading dim = n_experts) with its expert dim sharded over ``ep``;
    everything else replicated on the param's existing layout."""
    ep = int(dict(zip(mesh.axis_names, mesh.devices.shape)).get(ep_axis, 1))

    def place(path, x):
        in_moe = any("MoEFFN" in str(getattr(k, "key", k)) for k in path)
        is_expert = (
            in_moe
            and getattr(x, "ndim", 0) >= 1
            and x.shape[0] % ep == 0
            and not any(
                "router" in str(getattr(k, "key", k)) for k in path
            )
        )
        spec = P(ep_axis) if (is_expert and ep > 1) else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
