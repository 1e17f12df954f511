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

import optax

__all__ = ["make_optimizer", "add_optim_flags"]


def make_optimizer(
    lr: float,
    clip: float = 0.0,
    schedule: str = "const",
    total_steps: int | None = None,
    final_frac: float = 0.1,
) -> optax.GradientTransformation:
    """Adam with optional global-norm clipping and cosine LR decay."""
    if schedule == "cosine":
        if not total_steps:
            raise ValueError("cosine schedule needs total_steps")
        lr = optax.cosine_decay_schedule(
            init_value=lr, decay_steps=total_steps, alpha=final_frac
        )
    elif schedule != "const":
        raise ValueError(f"unknown lr schedule: {schedule!r}")
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
