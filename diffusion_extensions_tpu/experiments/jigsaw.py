"""Jigsaw translation toy: R^2 projected diffusion over rendered images.

TPU-native equivalent of ``jigsaw_translate.py:125-139`` (train) and
``jigsaw_test.py`` (eval):

    python -m diffusion_extensions_tpu.experiments.jigsaw --steps 40000
    python -m diffusion_extensions_tpu.experiments.jigsaw --test

The puzzle rendering runs *inside* the jitted step on-device (see
``data/jigsaw.py``), so there is no host rendering loop.  A fresh puzzle is
drawn per step (reference semantics: new ``JigsawPuzzle()`` each iteration,
``jigsaw_translate.py:131``) by regenerating the host-side constants — the
compiled step is reused since shapes are static.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.jigsaw import JigsawPuzzle
from ..models.coordconv import CoordConv
from ..processes.r3 import ProjectedGaussianDiffusion
from ..train.loop import MetricLogger, Throughput
from ..train.state import TrainState, restore_checkpoint, save_checkpoint

STEPS_DEFAULT = 40_000  # jigsaw_translate.py:129
BATCH_DEFAULT = 256  # jigsaw_translate.py:124


def build(args):
    model = CoordConv(size=args.size, dim=16)
    process = ProjectedGaussianDiffusion(
        timesteps=args.timesteps, loss_type="l2"
    )
    return model, process


def train(args):
    model, process = build(args)
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    x_img = jnp.zeros((args.batch, args.size, args.size, 3))
    params = model.init(init_key, x_img, jnp.zeros((args.batch,), jnp.int32))
    tx = optax.adam(args.lr)
    state = TrainState.create(params, tx, key)
    if args.resume:
        state = restore_checkpoint(args.ckpt, state)

    from ..data.jigsaw import render_jigsaw

    # One jitted step, parameterised by the puzzle's scalar constants so a
    # fresh puzzle per step does NOT recompile.
    @jax.jit
    def step_fn(state, sq_pos, circ_pos, x0):
        def projection(x):
            return render_jigsaw(x, sq_pos, circ_pos, args.size)

        key = jax.random.fold_in(state.key, state.step)
        step_key, next_key = jax.random.split(key)

        def loss_fn(params):
            return process.loss(
                lambda img, t: model.apply(params, img, t),
                step_key,
                jnp.broadcast_to(x0, (args.batch, 2)),
                projection=projection,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(tx, grads, next_key)
        return new_state, loss

    logger = MetricLogger(jsonl_path=args.log, print_every=args.print_every)
    meter = Throughput()
    for i in range(int(state.step), args.steps):
        jp = JigsawPuzzle(size=args.size, seed=args.seed * 1_000_003 + i)
        state, loss = step_fn(
            state,
            jnp.asarray(jp.square_pos, jnp.float32),
            jnp.asarray(jp.circle_pos, jnp.float32),
            jp.x_0,
        )
        meter.tick()
        if (i + 1) % args.print_every == 0:
            logger.log(
                i + 1,
                {"loss": loss, "steps_per_sec": meter.steps_per_sec or float("nan")},
            )
        if (i + 1) % args.ckpt_every == 0 or (i + 1) == args.steps:
            save_checkpoint(args.ckpt, state)
    return state


def test(args):
    model, process = build(args)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(
        key,
        jnp.zeros((1, args.size, args.size, 3)),
        jnp.zeros((1,), jnp.int32),
    )
    state = restore_checkpoint(
        args.ckpt, TrainState.create(params, optax.adam(args.lr), key),
        params_only=True,
    )
    if int(state.step) == 0:
        print("warning: no checkpoint found; evaluating untrained model")
    # device_put once and pass params as a jit ARGUMENT: closure-captured
    # arrays become tracing-time constants inlined into the HLO regardless
    # of device placement (the large-literal compile failure that hit the
    # protein suite) and are re-uploaded per call
    params = jax.device_put(state.params)

    jp = JigsawPuzzle(size=args.size, seed=args.seed + 1234)
    out = jax.jit(
        lambda p, k: process.p_sample_loop(
            lambda x, t: model.apply(p, x, t), k, (args.eval_batch, 2),
            projection=jp,
        )
    )(params, jax.random.PRNGKey(args.seed + 2))
    err = np.linalg.norm(np.asarray(out - jp.x_0[None]), axis=-1)
    # report in pixels (state*size/8) like the rendering transform
    err_px = err * args.size / 8.0
    print(
        f"final circle-position error over {args.eval_batch} samples: "
        f"median={np.median(err_px):.2f}px mean={err_px.mean():.2f}px "
        f"p90={np.percentile(err_px, 90):.2f}px"
    )
    os.makedirs("results", exist_ok=True)
    np.save("results/jigsaw_samples.npy", np.asarray(out))
    if args.plot:
        # final-frame grid (the reference renders sampled frames,
        # jigsaw_test.py:33-73)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        frames = np.asarray(jp(out[:16]))
        fig, axes = plt.subplots(4, 4, figsize=(8, 8))
        for ax, frame in zip(axes.ravel(), frames):
            ax.imshow(np.transpose(frame, (1, 0, 2)), origin="lower")
            ax.set_axis_off()
        path = args.plot if isinstance(args.plot, str) else "jigsaw_frames.png"
        fig.savefig(path, dpi=120, bbox_inches="tight")
        print(f"wrote {path}")
    return out


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Jigsaw translation toy")
    p.add_argument("--batch", type=int, default=BATCH_DEFAULT)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--steps", type=int, default=STEPS_DEFAULT)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", type=str, default="weights/jigsaw")
    p.add_argument("--ckpt-every", dest="ckpt_every", type=int, default=1000)
    p.add_argument("--print-every", dest="print_every", type=int, default=10)
    p.add_argument("--log", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug-nans", dest="debug_nans", action="store_true",
                   help="enable jax_debug_nans (the torch anomaly-mode equivalent)")
    p.add_argument("--test", action="store_true")
    p.add_argument("--eval-batch", dest="eval_batch", type=int, default=64)
    p.add_argument("--plot", nargs="?", const=True, default=False,
                   help="save a grid of final sampled frames (optional path)")
    return p.parse_args(argv)


def main(argv=None):
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    if args.test:
        test(args)
    else:
        train(args)


if __name__ == "__main__":
    main()
