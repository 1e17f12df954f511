"""GSPMD dp x tp (+ fsdp) training step: one global-batch program +
sharding constraints; XLA inserts the collectives.

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

``fsdp=True`` additionally shards the master params and Adam moments over
the dp axis at rest (ZeRO-3): each kernel is all-gathered just-in-time for
its matmuls and its gradient reduce-scattered back to the owning shard —
again purely from sharding constraints, with identical numerics to the
replicated layout (same global program).

A mesh with an ``"sp"`` axis additionally shards the *sequence* (points /
residues) dim of every batch leaf over it — sequence parallelism for the
point-cloud transformers, where N (not B) is the long axis.  The encoder's
attention then runs with queries sequence-sharded; GSPMD all-gathers K/V
over sp for the score matmul.  Again a pure layout choice: same global
program, mesh-shape-invariant numerics (asserted by ``tests/test_tp.py``).

The reference has no distributed support of any kind (SURVEY §2.7); this
module is TPU-native scale-out for its workloads.
"""
from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.state import TrainState

__all__ = ["make_gspmd_train_step", "tp_kernel_spec", "param_spec", "batch_spec"]


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


def param_spec(
    x,
    tp_size: int,
    dp_size: int = 1,
    tp_axis: str = "tp",
    dp_axis: str = "dp",
    min_dim: int = 64,
    fsdp: bool = False,
):
    """Combined tp + (optional) fsdp PartitionSpec for one param leaf.

    tp: matmul kernels column-sharded on their output dim (``tp_kernel_spec``
    rules).  fsdp (ZeRO-3 style): additionally shard the *largest remaining*
    divisible dim over the dp axis, so the master params and the Adam
    moments live dp-sharded at rest (1/dp memory per device) and GSPMD
    all-gathers each kernel just-in-time for its matmul and reduce-scatters
    its gradient — the "How to Scale Your Model" fsdp recipe, with XLA
    inserting the collectives from the sharding constraints alone.

    The spec is a pure function of the leaf's SHAPE, so the same function
    lays out params, gradients, and the param-shaped Adam moments
    identically (scalars like Adam's ``count`` fall through to ``P()``).
    """
    base = tp_kernel_spec(x, tp_size, tp_axis, min_dim)
    if not fsdp or dp_size <= 1 or getattr(x, "ndim", 0) < 1:
        return base
    assign = list(base) + [None] * (x.ndim - len(base))
    # largest dim not already tp-sharded, divisible by dp, and big enough
    # that sharding it is worth a collective
    candidates = [
        (x.shape[d], d)
        for d in range(x.ndim)
        if assign[d] is None and x.shape[d] % dp_size == 0
        and x.shape[d] >= min_dim
    ]
    if not candidates:
        return base
    _, d = max(candidates)
    assign[d] = dp_axis
    return P(*assign)


def batch_spec(x, dp_axis: str = "dp", sp_size: int = 1, sp_axis: str = "sp"):
    """PartitionSpec for one batch leaf: batch dim on dp; with an sp axis in
    the mesh, the sequence dim (axis 1: points / residues) is additionally
    sharded over sp when divisible.  Leaves whose axis 1 doesn't divide
    (e.g. per-sample scalars, odd-length masks) stay dp-only — mixing
    layouts is fine, GSPMD reconciles at use sites.
    """
    ndim = getattr(x, "ndim", 0)
    if ndim == 0:
        return P()
    if (
        sp_size > 1
        and ndim >= 2
        and x.shape[1] % sp_size == 0
        and x.shape[1] >= sp_size
    ):
        return P(dp_axis, sp_axis, *([None] * (ndim - 2)))
    return P(dp_axis, *([None] * (ndim - 1)))


def make_gspmd_train_step(
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    dp_axis: str = "dp",
    tp_axis: str = "tp",
    sp_axis: str = "sp",
    donate: bool = True,
    min_tp_dim: int = 64,
    fsdp: bool = False,
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
    dp = int(axis_sizes.get(dp_axis, 1))
    sp = int(axis_sizes.get(sp_axis, 1))

    def _constrain(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def _spec(x):
        return param_spec(x, tp, dp, tp_axis, dp_axis, min_tp_dim, fsdp)

    def constrain_params(params):
        return jax.tree_util.tree_map(lambda x: _constrain(x, _spec(x)), params)

    def constrain_batch(batch):
        return jax.tree_util.tree_map(
            lambda x: _constrain(x, batch_spec(x, dp_axis, sp, sp_axis)),
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
        if fsdp:
            # pin the param-shaped Adam moments to the fsdp layout so the
            # optimizer state never materialises replicated
            new_opt_state = jax.tree_util.tree_map(
                lambda x: _constrain(x, _spec(x)), new_opt_state
            )
        new_params = constrain_params(optax.apply_updates(params, updates))
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            key=next_key,
        )
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def shard_params(
    params,
    mesh: Mesh,
    tp_axis: str = "tp",
    min_dim: int = 64,
    dp_axis: str = "dp",
    fsdp: bool = False,
):
    """Pre-place a param tree on the mesh with the tp (+fsdp) kernel layout
    (the steady-state layout ``make_gspmd_train_step`` maintains)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = int(axis_sizes.get(tp_axis, 1))
    dp = int(axis_sizes.get(dp_axis, 1))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x,
            NamedSharding(
                mesh, param_spec(x, tp, dp, tp_axis, dp_axis, min_dim, fsdp)
            ),
        ),
        params,
    )
