"""Training state + full checkpointing.

The reference checkpoints bare ``state_dict`` weights with no optimizer
state, RNG, or step counter — no true resume (``so3_train.py:80-81``,
``aircraft_rotate.py:113-119``; SURVEY §5.4).  Here the checkpoint is the
complete ``TrainState`` pytree (params + opt state + step + PRNG key) via
orbax, so training resumes exactly.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "save_checkpoint", "restore_checkpoint", "latest_step"]


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    key: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, key) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            key=key,
        )

    def apply_gradients(self, tx: optax.GradientTransformation, grads, new_key):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return TrainState(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            key=new_key,
        )


def _mgr(ckpt_dir: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir)
    step = int(state.step) if step is None else step
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    return _mgr(ckpt_dir).latest_step()


def restore_checkpoint(
    ckpt_dir: str, target: TrainState, params_only: bool = False
) -> TrainState:
    """Restore the latest checkpoint into the structure of ``target``.

    ``params_only=True`` grafts only params/step/key from disk onto
    ``target``, ignoring the stored optimizer state entirely.  Eval paths
    use this: a checkpoint written with ``--clip``/``--lr-schedule``
    stabilizers has an ``optax.chain`` opt-state pytree that a bare-Adam
    eval-side ``TrainState.create`` cannot structurally match, and eval
    never touches the optimizer anyway.
    """
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        return target
    if params_only:
        raw = mgr.restore(step)  # structure-free: nested dicts off disk
        # Validate structure + leaf shapes against the target (ADVICE r4:
        # a checkpoint/model-config mismatch otherwise surfaces later as
        # an opaque flax apply error, or silently wrong eval).
        got = jax.tree_util.tree_structure(raw["params"])
        want = jax.tree_util.tree_structure(target.params)
        if got != want:
            raise ValueError(
                f"params_only restore from {ckpt_dir} step {step}: "
                f"checkpoint param tree does not match the model config "
                f"(stored {got} vs target {want}) — check the eval flags "
                f"match the training flags")
        for (kp, a), b in zip(
            jax.tree_util.tree_flatten_with_path(raw["params"])[0],
            jax.tree_util.tree_leaves(target.params),
        ):
            if tuple(getattr(a, "shape", ())) != tuple(b.shape):
                name = jax.tree_util.keystr(kp)
                raise ValueError(
                    f"params_only restore from {ckpt_dir} step {step}: "
                    f"shape mismatch at {name}: stored "
                    f"{getattr(a, 'shape', ())} vs model {b.shape}")
        return target.replace(
            step=jnp.asarray(raw["step"]),
            params=jax.tree_util.tree_map(jnp.asarray, raw["params"]),
            key=jnp.asarray(raw["key"]),
        )
    return mgr.restore(step, args=ocp.args.StandardRestore(target))
