"""Data-parallel training step over an ICI mesh via ``shard_map``.

TPU-native replacement for the reference's single-GPU training loops
(SURVEY §2.7, §5.8): the batch is sharded on the ``"dp"`` mesh axis, params
are replicated, and per-shard gradients are all-reduced with ``psum`` over
ICI before the optimizer update — so every device applies the identical
update and params stay replicated with no broadcast.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..train.state import TrainState

__all__ = ["make_dp_train_step", "shard_batch"]


def make_dp_train_step(
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    axis: str = "dp",
    donate: bool = True,
    steps_per_call: int = 1,
    log_norms: bool = False,
    skip_nonfinite: bool = False,
    per_layer_norms: bool = False,
):
    """Build a jitted data-parallel train step.

    ``loss_fn(params, key, batch) -> scalar loss`` is the per-shard loss on
    the local batch slice (mean-reduced over the slice).  Returns
    ``step(state, batch) -> (state, metrics)`` where the batch's leading dim
    is sharded over ``axis``.

    ``steps_per_call > 1`` fuses K sequential optimizer steps into one
    dispatch via ``lax.scan`` (the batch then carries a leading K dim,
    sharded on dim 1).  Same SGD math; measured ~15% higher throughput on
    the tunneled TPU by amortising per-execution runtime overhead.

    ``log_norms=True`` adds ``grad_norm``/``param_norm`` to the metrics —
    the equivalent of the reference's ``wandb.watch(net)`` gradient
    tracking (``so3_train.py:62``, ``prot_train.py:76``).
    ``per_layer_norms=True`` additionally reports one grad norm per
    top-level module (``grad_norm/<module>`` keys) — the per-layer half of
    ``wandb.watch``'s histogram stream, reduced to the norm scalar that is
    actually consumed when reading such dashboards.  Same single HBM
    sweep, just segmented.
    """

    def one_step(state: TrainState, batch, want_norms=True):
        # Per-device PRNG: fold the mesh position into this step's key so
        # shards draw independent noise.
        idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(state.key, state.step)
        step_key, next_key = jax.random.split(key)
        local_key = jax.random.fold_in(step_key, idx)

        loss, grads = jax.value_and_grad(loss_fn)(state.params, local_key, batch)
        # ICI all-reduce: mean gradients and loss across shards.
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        new_state = state.apply_gradients(tx, grads, next_key)
        if skip_nonfinite:
            # branch-free equivalent of the reference's NaN-skip
            # (so3_lock_train.py:83-84): a step whose global loss or grads
            # are non-finite advances step/PRNG but leaves params and
            # optimizer state untouched.  Divergence from the reference's
            # `continue`: TrainState.step still advances on a skipped step
            # (Adam's opt_state count is held), so a step-indexed LR
            # schedule moves ahead by one on every NaN skip — schedule-
            # sensitive runs should count skips if exactness matters.
            import optax

            ok = jnp.logical_and(
                jnp.isfinite(loss), jnp.isfinite(optax.global_norm(grads))
            )
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old
            )
            new_state = TrainState(
                step=new_state.step,
                params=keep(new_state.params, state.params),
                opt_state=keep(new_state.opt_state, state.opt_state),
                key=new_state.key,
            )
        metrics = {"loss": loss}
        if log_norms:
            import optax

            # Norms cost a full HBM sweep of grads + params; only the final
            # fused sub-step's metrics are reported, so under lax.cond the
            # earlier K-1 sub-steps skip that sweep at runtime.
            def with_norms():
                return (optax.global_norm(grads),
                        optax.global_norm(new_state.params))

            def without():
                # dtypes must match with_norms() or lax.cond fails to
                # trace under non-f32 params (ADVICE r4)
                gdt = jnp.result_type(*jax.tree_util.tree_leaves(grads))
                pdt = jnp.result_type(
                    *jax.tree_util.tree_leaves(new_state.params))
                return (jnp.zeros((), gdt), jnp.zeros((), pdt))

            gn, pn = jax.lax.cond(want_norms, with_norms, without)
            metrics["grad_norm"] = gn
            metrics["param_norm"] = pn
            if per_layer_norms:
                import optax

                # segment the same sweep by top-level module (flax param
                # trees are {"params": {<Module_i>: ...}})
                inner = grads.get("params", grads) if isinstance(
                    grads, dict) else grads
                if isinstance(inner, dict):
                    def layer_norms():
                        return {
                            k: optax.global_norm(v).astype(jnp.float32)
                            for k, v in inner.items()
                        }

                    def layer_zeros():
                        return {
                            k: jnp.zeros((), jnp.float32) for k in inner
                        }

                    per = jax.lax.cond(want_norms, layer_norms, layer_zeros)
                    for k, v in per.items():
                        metrics[f"grad_norm/{k}"] = v
        return new_state, metrics

    if steps_per_call == 1:
        shard_step = one_step
        batch_spec = P(axis)
    else:

        def shard_step(state: TrainState, batches):
            K = jax.tree_util.tree_leaves(batches)[0].shape[0]

            def body(state, ib):
                i, batch = ib
                return one_step(state, batch, want_norms=(i == K - 1))

            state, metrics = jax.lax.scan(
                body, state, (jnp.arange(K), batches)
            )
            return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

        batch_spec = P(None, axis)

    state_spec = P()  # replicated

    mapped = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(state_spec, batch_spec),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a host batch with its leading dim sharded over the mesh."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
