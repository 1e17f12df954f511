"""Pipeline parallelism: GPipe-style microbatch pipeline over a stack of
identical layers, built from ``shard_map`` + ``lax.ppermute`` + ``lax.scan``.

The reference has no distributed support (SURVEY §2.7); this is the TPU
"How to Scale Your Model" pipelining recipe for its transformer stacks:

* the per-layer parameter pytrees are STACKED on a leading layer dim L and
  sharded over the ``"pp"`` mesh axis, so each of the P stages holds L/P
  contiguous layers (1/P of the block params per device);
* the batch is split into M microbatches; a ``lax.scan`` over M+P-1 ticks
  flows them through the stages, each tick ending in a ``ppermute`` that
  ships the activation one stage down the ring (one ICI hop);
* every stage applies its local layers with an inner ``lax.scan`` over its
  stacked params (a single compiled layer body, not P copies);
* the last stage's outputs are masked-``psum``-replicated so the caller
  sees the plain global output — and because ``ppermute``/``scan`` are
  linear/differentiable, ``jax.grad`` through the pipeline yields exactly
  the stacked-layer gradients, reduce-scattered back onto the pp shards.

Bubble fraction is the textbook (P-1)/(M+P-1); choose M >= 4*P in
production.  Numerics are microbatch-invariant for batch-independent
layers (anything without cross-example reductions), asserted by
``tests/test_pp.py`` against the unpipelined stack.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["pipeline_apply", "stack_layer_params", "shard_stacked_params"]


def stack_layer_params(per_layer_params):
    """Stack a list of identical-structure per-layer pytrees on a new
    leading layer dim (the layout ``pipeline_apply`` consumes)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_layer_params
    )


def shard_stacked_params(stacked, mesh: Mesh, pp_axis: str = "pp"):
    """Place stacked layer params with the leading (layer) dim sharded over
    the pp axis — the at-rest layout of a pipeline stage."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(pp_axis))), stacked
    )


def pipeline_apply(
    layer_fn: Callable,
    stacked_params,
    x: jax.Array,
    mesh: Mesh,
    n_microbatches: int,
    pp_axis: str = "pp",
    dp_axis: str = "dp",
    layer_has_aux: bool = False,
):
    """Apply L stacked layers to ``x`` through a P-stage pipeline.

    ``layer_fn(params_l, h) -> h`` is one layer; ``stacked_params`` leaves
    carry a leading dim L with ``L % P == 0``; ``x`` is the global batch
    ``(B, ...)`` with ``B % n_microbatches == 0``.  Returns ``layer_L(...
    layer_1(x))`` exactly as the sequential stack would, replicated.

    ``layer_has_aux=True`` switches the contract to ``layer_fn(params_l, h)
    -> (h, aux_scalar)`` (e.g. a MoE layer's sown load-balance loss) and
    the return to ``(out, aux)``: aux is summed over layers and averaged
    over microbatches — per-tick contributions from pipeline warmup/drain
    ticks (whose activations are garbage and discarded) are masked out, so
    only real microbatch×layer work contributes.  Note the semantic delta
    vs the unpipelined model: each microbatch's router balance is computed
    over its own mb*N tokens, so aux is the MEAN of per-microbatch
    balance losses rather than one full-batch loss — both are valid
    Switch regularizers (Fedus et al. compute it per-device anyway).

    Composes with data parallelism: on a mesh that also has a ``dp_axis``,
    the microbatch dim is dp-sharded and each dp replica runs its own
    pipeline over the pp ring.

    Differentiable: use inside a loss under ``jax.grad``; gradients for
    ``stacked_params`` come back sharded on the pp axis.

    Memory note: every pp stage holds the full ``(M, mb, ...)`` microbatch
    stack (``micro`` enters the shard_map replicated over pp), so per-stage
    activation-input memory scales with the *global* batch, and drain ticks
    recompute clamped feed microbatches whose outputs are discarded.  That
    partially offsets pipelining's memory benefit for very large batches;
    if that bites, feed stage 0 from a pp-sharded or host-streamed
    microbatch source instead of the replicated stack.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    pp = int(axis_sizes[pp_axis])
    has_dp = dp_axis in axis_sizes and int(axis_sizes[dp_axis]) > 1
    micro_spec = P(None, dp_axis) if has_dp else P()
    vary_axes = (pp_axis, dp_axis) if has_dp else (pp_axis,)
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert n_layers % pp == 0, f"{n_layers} layers not divisible by pp={pp}"
    batch = x.shape[0]
    assert batch % n_microbatches == 0, (
        f"batch {batch} not divisible by {n_microbatches} microbatches"
    )
    mb = batch // n_microbatches
    micro = x.reshape((n_microbatches, mb) + x.shape[1:])

    def stage_apply(local_params, h):
        # the stage's L/P layers, one compiled body via scan; aux (when
        # present) is summed over the stage's local layers
        def body(h, p_l):
            if layer_has_aux:
                h, aux = layer_fn(p_l, h)
                return h, aux.astype(jnp.float32)
            return layer_fn(p_l, h), jnp.zeros((), jnp.float32)

        h, auxs = jax.lax.scan(body, h, local_params)
        return h, jnp.sum(auxs)

    def pipelined(local_params, micro):
        # inside shard_map over pp: local_params leaves are (L/P, ...),
        # micro is the full (M, mb, ...) microbatch stack (replicated)
        stage = jax.lax.axis_index(pp_axis)
        m = micro.shape[0]
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        # mark the buffers as per-stage state (device-varying over pp, and
        # over dp when the microbatches are dp-sharded) so the shard_map
        # vma checker sees it from the start
        def _vary(v):
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(v, vary_axes, to="varying")
            return jax.lax.pvary(v, vary_axes)

        out0 = _vary(jnp.zeros((m,) + micro.shape[1:], micro.dtype))
        carry0 = _vary(jnp.zeros(micro.shape[1:], micro.dtype))
        aux0 = _vary(jnp.zeros((), jnp.float32))

        def tick(state, t):
            h, out, aux = state
            # stage 0 ingests microbatch t (clamped index; garbage ticks
            # compute but are never stored), others take the ppermuted
            # activation from the previous tick
            feed = micro[jnp.clip(t, 0, m - 1)]
            h_in = jnp.where(stage == 0, feed, h)
            h_out, aux_t = stage_apply(local_params, h_in)
            # stage s works on real microbatch t-s only while
            # 0 <= t-s < m; warmup/drain ticks produce garbage activations
            # (and garbage aux) that must not be accumulated
            real = jnp.logical_and(t - stage >= 0, t - stage < m)
            aux = aux + jnp.where(real, aux_t, 0.0)
            # ship to the next stage for the next tick
            h_next = jax.lax.ppermute(h_out, pp_axis, perm)
            # last stage finished microbatch t-(P-1) this tick
            out_idx = t - (pp - 1)
            valid = jnp.logical_and(stage == pp - 1, out_idx >= 0)
            upd = jax.lax.dynamic_update_index_in_dim(
                out, h_out, jnp.maximum(out_idx, 0), 0
            )
            out = jnp.where(valid, upd, out)
            return (h_next, out, aux), None

        (_, out, aux), _ = jax.lax.scan(
            tick, (carry0, out0, aux0), jnp.arange(m + pp - 1)
        )
        # replicate the last stage's buffer to every stage so the caller
        # sees a plain replicated output
        out = jax.lax.psum(
            jnp.where(stage == pp - 1, out, jnp.zeros_like(out)), pp_axis
        )
        # total over layers (each stage holds L/P of them), mean over the
        # M microbatches; replicated over pp by the psum itself
        aux = jax.lax.psum(aux, pp_axis) / m
        if has_dp:
            # a scalar cannot be dp-sharded on output; replicate the
            # cross-replica mean instead (matches dp loss averaging)
            aux = jax.lax.pmean(aux, dp_axis)
        return out, aux

    if layer_has_aux:
        mapped = jax.shard_map(
            pipelined,
            mesh=mesh,
            in_specs=(P(pp_axis), micro_spec),
            out_specs=(micro_spec, P()),
        )
        out, aux = mapped(stacked_params, micro)
        return out.reshape((batch,) + out.shape[2:]), aux

    def no_aux(local_params, micro):
        out, _ = pipelined(local_params, micro)
        return out

    mapped = jax.shard_map(
        no_aux,
        mesh=mesh,
        in_specs=(P(pp_axis), micro_spec),
        out_specs=micro_spec,
    )
    out = mapped(stacked_params, micro)
    return out.reshape((batch,) + out.shape[2:])
