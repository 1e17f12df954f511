"""GSPMD dp x tp training step: one global-batch program + sharding
constraints; XLA inserts the collectives.

Complementary to ``parallel.dp.make_dp_train_step`` (explicit shard_map +
psum): here the training step is written over the *logical global batch*,
the batch is annotated sharded on the ``"dp"`` mesh axis and large matmul
kernels on the ``"tp"`` axis, and the GSPMD partitioner inserts the
gradient all-reduce over dp and the activation all-gathers /
gradient reduce-scatters over tp (the "How to Scale Your Model" recipe:
pick a mesh, annotate, let XLA do the rest).

Because the program is global, its numerics are *mesh-independent*: the
same step on dp=8/tp=1, dp=4/tp=2 or one device produces identical results
up to float reduction order (asserted by ``tests/test_tp.py``) — the
correctness contract that lets a run move between mesh shapes.

The reference has no distributed support of any kind (SURVEY §2.7); this
module is TPU-native scale-out for its workloads.
"""
from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.state import TrainState

__all__ = ["make_gspmd_train_step", "tp_kernel_spec"]


def tp_kernel_spec(x, tp_size: int, tp_axis: str = "tp", min_dim: int = 64):
    """PartitionSpec for one param leaf: shard matmul kernels over their
    output (last) dim on ``tp_axis``; replicate biases/small leaves.

    Output-dim (column) sharding keeps every dense layer's forward a local
    matmul producing tp-sharded activations; successive layers alternate
    gather/scatter, all on ICI.
    """
    if (
        tp_size > 1
        and getattr(x, "ndim", 0) >= 2
        and x.shape[-1] >= min_dim
        and x.shape[-1] % tp_size == 0
    ):
        return P(*([None] * (x.ndim - 1)), tp_axis)
    return P()


def make_gspmd_train_step(
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    dp_axis: str = "dp",
    tp_axis: str = "tp",
    donate: bool = True,
    min_tp_dim: int = 64,
):
    """Build a jitted dp x tp train step.

    ``loss_fn(params, key, batch) -> scalar`` is the loss over the GLOBAL
    batch (mean-reduced), exactly as in single-device code — no axis_index,
    no pmean.  Returns ``step(state, batch) -> (state, metrics)``.

    Unlike the shard_map dp step (which folds the shard index into the PRNG
    key), noise here is drawn once for the global batch, so results do not
    depend on the mesh shape.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = int(axis_sizes.get(tp_axis, 1))

    def _constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def constrain_params(params):
        return jax.tree_util.tree_map(
            lambda x: _constrain(x, tp_kernel_spec(x, tp, tp_axis, min_tp_dim)),
            params,
        )

    def constrain_batch(batch):
        return jax.tree_util.tree_map(
            lambda x: _constrain(x, P(dp_axis, *([None] * (x.ndim - 1)))),
            batch,
        )

    def step(state: TrainState, batch):
        params = constrain_params(state.params)
        batch = constrain_batch(batch)
        key = jax.random.fold_in(state.key, state.step)
        step_key, next_key = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(params, step_key, batch)
        grads = constrain_params(grads)  # keep grads on the param layout
        updates, new_opt_state = tx.update(grads, state.opt_state, params)
        new_params = constrain_params(optax.apply_updates(params, updates))
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            key=next_key,
        )
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def shard_params(params, mesh: Mesh, tp_axis: str = "tp", min_dim: int = 64):
    """Pre-place a param tree on the mesh with the tp kernel layout (the
    steady-state layout ``make_gspmd_train_step`` maintains)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = int(axis_sizes.get(tp_axis, 1))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, tp_kernel_spec(x, tp, tp_axis, min_dim))
        ),
        params,
    )
