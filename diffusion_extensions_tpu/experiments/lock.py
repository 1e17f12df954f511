"""Gimbal-lock ablation: SO(3) vs Euler-angle diffusion on a geodesic
segment through the gimbal-lock region.

TPU-native equivalent of ``so3_lock_train.py``/``euler_lock_train.py`` and
``so3_lock_test.py``/``euler_lock_test.py``:

    python -m diffusion_extensions_tpu.experiments.lock --param so3 --steps 100000
    python -m diffusion_extensions_tpu.experiments.lock --param euler --test

Data: so3_lerp(R(0,pi/3,0), R(0,2pi/3,0), U(0,1)) — rotations about y
spanning the |y| = pi/2 gimbal-lock point (``so3_lock_train.py:76-81``).
The euler baseline diffuses the xyz Euler decomposition of the same data
(``euler_lock_train.py:67-71``).  Test mode samples the trained model and
reports how well final frames stay on the segment (angle about y, deviation
from the y-axis) — the quantitative core of the reference's mayavi sphere
visual (``so3_lock_test.py:36-82``).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.synthetic import sample_lock_batch
from ..models.rot_predict import EulerRotPredict, RotPredict
from ..ops.so3 import euler_to_rmat, rmat_to_euler
from ..parallel.dp import make_dp_train_step, shard_batch
from ..parallel.mesh import make_mesh
from ..processes.r3 import GaussianDiffusion
from ..processes.so3 import SO3Diffusion
from ..train.loop import MetricLogger, Throughput
from ..train.state import TrainState, restore_checkpoint, save_checkpoint


def build(args):
    if args.param == "so3":
        model = RotPredict(d_model=255, out_type="skewvec", variant="resnet")
        process = SO3Diffusion.create(args.timesteps, loss_type="skewvec")
    else:
        model = EulerRotPredict(d_model=255)
        process = GaussianDiffusion.create(args.timesteps, loss_type="l2")
    return model, process


def _make_batch_fn(args):
    """Jitted data sampler: the so3_lerp chain is ~30 ops — eager per-step
    dispatch through the device relay pays ~25ms per op and would dominate
    the step time (observed <2 steps/s before jitting)."""

    @jax.jit
    def batch_fn(key):
        rots = sample_lock_batch(key, args.batch)
        if args.param == "so3":
            return rots
        return jnp.stack(rmat_to_euler(rots), axis=-1)

    return batch_fn


def train(args):
    model, process = build(args)
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    x_init = (
        jnp.zeros((args.batch, 3, 3))
        if args.param == "so3"
        else jnp.zeros((args.batch, 3))
    )
    params = model.init(init_key, x_init, jnp.zeros((args.batch,), jnp.int32))
    tx = optax.adam(args.lr)
    state = TrainState.create(params, tx, key)
    if args.resume:
        state = restore_checkpoint(args.ckpt, state)

    mesh = make_mesh()

    def loss_fn(params, key, batch):
        return process.loss(lambda x, t: model.apply(params, x, t), key, batch)

    # skip_nonfinite: the reference's lock trainer skips NaN-loss steps
    # (so3_lock_train.py:83-84) — same resilience, branch-free under jit
    step_fn = make_dp_train_step(loss_fn, tx, mesh, skip_nonfinite=True)
    batch_fn = _make_batch_fn(args)
    logger = MetricLogger(jsonl_path=args.log, print_every=args.print_every)
    meter = Throughput()
    data_key = jax.random.PRNGKey(args.seed + 1)
    # NaN-skip guard of the reference (so3_lock_train.py:83-84) is
    # unnecessary here (log_rmat is NaN-free by construction) but loss
    # finiteness is still asserted.
    for i in range(int(state.step), args.steps):
        data_key, k = jax.random.split(data_key)
        batch = shard_batch(batch_fn(k), mesh)
        state, metrics = step_fn(state, batch)
        meter.tick()
        if (i + 1) % args.print_every == 0:
            logger.log(
                i + 1,
                {"loss": metrics["loss"],
                 "steps_per_sec": meter.steps_per_sec or float("nan")},
            )
        if (i + 1) % args.ckpt_every == 0 or (i + 1) == args.steps:
            save_checkpoint(args.ckpt, state)
    return state


def test(args):
    model, process = build(args)
    key = jax.random.PRNGKey(args.seed)
    x_init = (
        jnp.zeros((1, 3, 3)) if args.param == "so3" else jnp.zeros((1, 3))
    )
    params = model.init(key, x_init, jnp.zeros((1,), jnp.int32))
    state = restore_checkpoint(
        args.ckpt, TrainState.create(params, optax.adam(args.lr), key),
        params_only=True,
    )
    if int(state.step) == 0:
        print("warning: no checkpoint found; sampling from untrained model")
    # device_put once and pass params as a jit ARGUMENT: closure-captured
    # arrays become tracing-time constants inlined into the HLO regardless
    # of device placement (the large-literal compile failure that hit the
    # protein suite) and are re-uploaded per call
    params = jax.device_put(state.params)

    # reference inits: Haar-QR rotations (so3_lock_test.py:24;
    # euler variant decomposes them to euler angles first,
    # euler_lock_test.py:22-24)
    if args.param == "so3":
        rots = jax.jit(
            lambda p, k: process.p_sample_loop(
                lambda x, t: model.apply(p, x, t), k, (args.eval_batch,),
                init="qr",
            )
        )(params, jax.random.PRNGKey(args.seed + 2))
    else:
        from ..ops.so3 import haar_rotations, rmat_to_euler as r2e

        r0 = haar_rotations(jax.random.PRNGKey(args.seed + 3), (args.eval_batch,))
        x_init = jnp.stack(r2e(r0), axis=-1)
        eul = jax.jit(
            lambda p, k: process.p_sample_loop(
                lambda x, t: model.apply(p, x, t), k, (args.eval_batch, 3),
                x_init=x_init,
            )
        )(params, jax.random.PRNGKey(args.seed + 2))
        rots = euler_to_rmat(eul[..., 0], eul[..., 1], eul[..., 2])

    # Quantitative lock check: on-segment rotations are pure-y rotations
    # with angle in [pi/3, 2pi/3].  Report axis deviation + angle stats.
    from ..ops.so3 import rmat_to_aa

    axis, angle = rmat_to_aa(rots)
    y_align = np.abs(np.asarray(axis)[:, 1])  # |axis . y|
    ang = np.asarray(angle)[:, 0]
    in_range = ((ang > np.pi / 3 - 0.1) & (ang < 2 * np.pi / 3 + 0.1)).mean()
    print(f"param={args.param}  samples={args.eval_batch}")
    print(f"  |axis.y| mean={y_align.mean():.4f}  (1.0 = perfectly on-axis)")
    print(f"  angle mean={ang.mean():.4f} rad  in-range frac={in_range:.3f}")
    os.makedirs("results", exist_ok=True)
    np.save(f"results/lock_samples_{args.param}.npy", np.asarray(rots))
    if args.plot:
        # the reference's mayavi sphere scatter of final frames
        # (so3_lock_test.py:51-82), rendered headless
        from ..viz.sphere import plot_rotation_frames

        os.makedirs("images", exist_ok=True)
        out = f"images/lock_sphere_{args.param}.png"
        plot_rotation_frames(
            rots, out_path=out,
            title=f"lock suite final frames ({args.param})",
        )
        print(f"wrote {out}")
    return rots


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Gimbal-lock ablation")
    p.add_argument("--param", choices=["so3", "euler"], default="so3")
    p.add_argument("--batch", type=int, default=32)  # so3_lock_train.py:62
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--ckpt-every", dest="ckpt_every", type=int, default=1000)
    p.add_argument("--print-every", dest="print_every", type=int, default=10)
    p.add_argument("--log", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug-nans", dest="debug_nans", action="store_true",
                   help="enable jax_debug_nans (the torch anomaly-mode equivalent)")
    p.add_argument("--test", action="store_true")
    p.add_argument("--eval-batch", dest="eval_batch", type=int, default=512)
    p.add_argument("--plot", action="store_true",
                   help="render the final-frame sphere scatter "
                        "(so3_lock_test.py:51-82 figure)")
    args = p.parse_args(argv)
    if args.ckpt is None:
        args.ckpt = f"weights/lock_{args.param}"
    return args


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
