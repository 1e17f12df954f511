"""Optimizer factory shared by the experiment drivers.

The reference trains every experiment with bare constant-LR Adam
(``aircraft_rotate.py:102``, ``prot_train.py:88``, ``so3_train.py:63``)
and no gradient clipping.  Round 4 found that this protocol is unstable
at the reference's own 1M-step aircraft budget (train loss and the frozen
validation probe both rise monotonically from ~120k steps and the 1M
checkpoint samples near the Haar prior — see BENCHMARKS.md "1M-step
divergence study"), so the drivers expose two opt-in stabilizers:

* ``--clip C``      — global-norm gradient clipping before Adam;
* ``--lr-schedule cosine`` — cosine decay of the LR from ``lr`` to
  ``final_frac * lr`` over the full ``--steps`` budget.

With both knobs at their defaults (``clip=0``, ``schedule="const"``) the
returned transformation is *exactly* ``optax.adam(lr)`` — same opt-state
pytree structure — so checkpoints written by earlier rounds keep
restoring.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["make_optimizer", "add_optim_flags", "fused_adam"]


class FusedAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def fused_adam(
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    clip: float = 0.0,
    state_dtype=None,
) -> optax.GradientTransformation:
    """Adam (+ optional global-norm clip) as ONE elementwise expression
    per leaf.

    Mathematically identical to ``optax.chain(clip_by_global_norm(clip),
    adam(lr))`` but structured so XLA emits a single loop fusion per leaf
    that reads ``(g, mu, nu)`` and writes ``(update, mu, nu)`` — instead
    of optax's per-transform passes, each of which materializes a full
    129M-param intermediate on the ProtNet step (the roofline's 10.7 ms
    standalone opt_update; BENCHMARKS.md "ProtNet train-step roofline").
    The clip folds into the same expression as a scalar multiplier, so
    its only extra traffic is the one grad-norm reduction read.

    ``state_dtype`` (e.g. ``jnp.bfloat16``) stores the (mu, nu) moment
    trees compressed; the update math still runs in f32 (moments are cast
    up inside the fusion).  The optimizer sweep is pure HBM bandwidth at
    >100M params (roofline: ~3.6 GB/step at f32), and mu+nu are 4 of its
    7 full-tree passes — bf16 moments cut the sweep's traffic ~29% for a
    quantization error of ~2^-8 relative on the moment EMAs, which the
    eps floor and the sqrt in the denominator largely wash out (measured
    loss parity: BENCHMARKS.md roofline section, r4 bf16-state arm).
    """

    def init(params):
        def zeros():
            if state_dtype is None:
                return jax.tree_util.tree_map(jnp.zeros_like, params)
            return jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, state_dtype), params
            )
        return FusedAdamState(jnp.zeros((), jnp.int32), zeros(), zeros())

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        cf = count.astype(jnp.float32)
        # optax.scale_by_schedule evaluates the schedule at the PRE-
        # increment count (step 0 uses schedule(0)); bias correction at
        # the post-increment count — match both exactly
        lr_t = jnp.asarray(
            lr(state.count) if callable(lr) else lr, jnp.float32
        )
        bc1 = 1.0 - b1 ** cf
        bc2 = 1.0 - b2 ** cf
        if clip and clip > 0:
            gnorm = optax.global_norm(grads)
            # optax.clip_by_global_norm semantics: rescale only when the
            # norm exceeds the threshold
            scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
        else:
            scale = None

        def leaf(g, mu, nu):
            if scale is not None:
                g = g * scale
            mu2 = b1 * mu.astype(g.dtype) + (1.0 - b1) * g
            nu2 = b2 * nu.astype(g.dtype) + (1.0 - b2) * (g * g)
            upd = (-lr_t) * (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
            if state_dtype is not None:
                mu2 = mu2.astype(state_dtype)
                nu2 = nu2.astype(state_dtype)
            return upd, mu2, nu2

        flat_g, tdef = jax.tree_util.tree_flatten(grads)
        flat_mu = jax.tree_util.tree_leaves(state.mu)
        flat_nu = jax.tree_util.tree_leaves(state.nu)
        out = [leaf(g, m, n) for g, m, n in zip(flat_g, flat_mu, flat_nu)]
        unflat = lambda i: jax.tree_util.tree_unflatten(
            tdef, [o[i] for o in out]
        )
        return unflat(0), FusedAdamState(count, unflat(1), unflat(2))

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float,
    clip: float = 0.0,
    schedule: str = "const",
    total_steps: int | None = None,
    final_frac: float = 0.1,
    impl: str = "optax",
    state_dtype: str = "f32",
) -> optax.GradientTransformation:
    """Adam with optional global-norm clipping and cosine LR decay.

    ``impl="fused"`` swaps in :func:`fused_adam` — same math, different
    opt-state pytree structure (eval restores are ``params_only`` so
    checkpoints stay readable either way; *resume* needs the same impl).

    ``state_dtype="bf16"`` stores the Adam moments compressed (update
    math stays f32) to cut the bandwidth-bound optimizer sweep's HBM
    traffic at >100M params; it requires the fused impl (optax's
    ``mu_dtype`` compresses mu only) and is opt-in — never a default —
    because bf16's 2^-8 resolution can quantize away small nu increments
    at b2=0.999 (measured A/B in BENCHMARKS.md before relying on it).
    """
    if schedule == "cosine":
        if not total_steps:
            raise ValueError("cosine schedule needs total_steps")
        lr = optax.cosine_decay_schedule(
            init_value=lr, decay_steps=total_steps, alpha=final_frac
        )
    elif schedule != "const":
        raise ValueError(f"unknown lr schedule: {schedule!r}")
    if state_dtype not in ("f32", "bf16"):
        raise ValueError(f"unknown opt state dtype: {state_dtype!r}")
    if state_dtype == "bf16" and impl != "fused":
        raise ValueError("--opt-state-dtype bf16 requires --opt-impl fused")
    if impl == "fused":
        sd = jnp.bfloat16 if state_dtype == "bf16" else None
        return fused_adam(lr, clip=clip, state_dtype=sd)
    if impl != "optax":
        raise ValueError(f"unknown optimizer impl: {impl!r}")
    adam = optax.adam(lr)
    if clip and clip > 0:
        return optax.chain(optax.clip_by_global_norm(clip), adam)
    return adam


def add_optim_flags(parser) -> None:
    """Attach the shared ``--clip`` / ``--lr-schedule`` flags."""
    parser.add_argument(
        "--clip", type=float, default=0.0,
        help="global-norm gradient clip before Adam (0 = off, the "
             "reference protocol)",
    )
    parser.add_argument(
        "--lr-schedule", dest="lr_schedule",
        choices=("const", "cosine"), default="const",
        help="LR schedule: const (reference protocol) or cosine decay "
             "to 0.1*lr over --steps",
    )
    parser.add_argument(
        "--opt-impl", dest="opt_impl", choices=("optax", "fused"),
        default="optax",
        help="Adam implementation: optax (chain) or fused single-"
             "expression update (same math, fewer HBM passes; opt-state "
             "structure differs, so resume with the same impl)",
    )
    parser.add_argument(
        "--opt-state-dtype", dest="opt_state_dtype",
        choices=("f32", "bf16"), default="f32",
        help="Adam moment storage dtype (bf16 halves the optimizer "
             "sweep's mu/nu HBM traffic; needs --opt-impl fused; "
             "measured option, see BENCHMARKS.md roofline)",
    )
