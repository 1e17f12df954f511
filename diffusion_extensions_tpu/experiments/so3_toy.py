"""Toy SO(3) diffusion: two rotation modes (+-90deg about z).

TPU-native equivalent of the reference drivers ``so3_train.py:54-81`` (train)
and ``so3_test.py`` (sample + convergence eval), as one CLI:

    python -m diffusion_extensions_tpu.experiments.so3_toy --steps 5000
    python -m diffusion_extensions_tpu.experiments.so3_toy --test

Training is a single jitted step (process loss -> grad -> adam) over a
device mesh (data-parallel when more than one chip is visible); evaluation
runs the full ``lax.scan`` reverse chain and reports geodesic distance to
the nearest mode (the reference plots traces; we print the percentile
summary, ``so3_test.py:74-80`` semantics).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.synthetic import sample_two_mode_batch, two_mode_rotations
from ..models.rot_predict import RotPredict
from ..ops.metrics import rmat_dist
from ..parallel.dp import make_dp_train_step, shard_batch
from ..parallel.mesh import make_mesh
from ..train.loop import MetricLogger, Throughput
from ..train.state import TrainState, restore_checkpoint, save_checkpoint
from ..processes.so3 import SO3Diffusion


def build(args):
    model = RotPredict(d_model=args.d_model, out_type="skewvec")
    process = SO3Diffusion.create(args.timesteps, loss_type="skewvec")
    return model, process


def train(args):
    model, process = build(args)
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    x_init = jnp.zeros((args.batch, 3, 3))
    t_init = jnp.zeros((args.batch,), dtype=jnp.int32)
    params = model.init(init_key, x_init, t_init)
    tx = optax.adam(args.lr)
    state = TrainState.create(params, tx, key)
    if args.resume:
        state = restore_checkpoint(args.ckpt, state)

    mesh = make_mesh()

    def loss_fn(params, key, batch):
        return process.loss(
            lambda x, t: model.apply(params, x, t), key, batch
        )

    step_fn = make_dp_train_step(loss_fn, tx, mesh)

    logger = MetricLogger(jsonl_path=args.log, print_every=args.print_every)
    meter = Throughput()
    batch_fn = jax.jit(lambda k: sample_two_mode_batch(k, args.batch))
    data_key = jax.random.PRNGKey(args.seed + 1)
    for i in range(int(state.step), args.steps):
        data_key, k = jax.random.split(data_key)
        batch = shard_batch(batch_fn(k), mesh)
        state, metrics = step_fn(state, batch)
        meter.tick()
        if (i + 1) % args.print_every == 0:
            sps = meter.steps_per_sec
            logger.log(
                i + 1,
                {"loss": metrics["loss"], "steps_per_sec": sps or float("nan")},
            )
        if (i + 1) % args.ckpt_every == 0 or (i + 1) == args.steps:
            save_checkpoint(args.ckpt, state)
    return state


def test(args):
    model, process = build(args)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, jnp.zeros((1, 3, 3)), jnp.zeros((1,), jnp.int32))
    tx = optax.adam(args.lr)
    state = restore_checkpoint(
        args.ckpt, TrainState.create(params, tx, key), params_only=True
    )
    if int(state.step) == 0:
        print("warning: no checkpoint found; sampling from untrained model")

    # device_put once and pass params as a jit ARGUMENT: closure-captured
    # arrays become tracing-time constants inlined into the HLO regardless
    # of device placement (the large-literal compile failure that hit the
    # protein suite) and are re-uploaded per call
    params = jax.device_put(state.params)
    t0 = time.perf_counter()
    if args.plot:
        samples, traj = jax.jit(
            lambda p, k: process.p_sample_loop(
                lambda x, t: model.apply(p, x, t), k, (args.eval_batch,),
                return_trajectory=True,
            )
        )(params, jax.random.PRNGKey(args.seed + 2))
    else:
        # sampler selection (trained-model A/B evidence for the
        # beyond-reference accelerated chains, BENCHMARKS.md "Chains")
        def make_loop(p, k):
            denoise = lambda x, t: model.apply(p, x, t)
            if args.sampler == "ddim":
                return process.ddim_sample_loop(
                    denoise, k, (args.eval_batch,),
                    num_steps=args.sampler_steps)
            if args.sampler == "pf":
                return process.pf_sample_loop(
                    denoise, k, (args.eval_batch,),
                    num_steps=args.sampler_steps, method="flow")
            return process.p_sample_loop(denoise, k, (args.eval_batch,))

        samples = jax.jit(make_loop)(
            params, jax.random.PRNGKey(args.seed + 2))
    samples.block_until_ready()
    dt = time.perf_counter() - t0

    modes = two_mode_rotations()
    # sqrt(2)*theta -> theta (reference scales by 0.70710678, so3_test.py:76-77)
    d0 = rmat_dist(samples, modes[0][None]) * 0.70710678118
    d1 = rmat_dist(samples, modes[1][None]) * 0.70710678118
    best = jnp.minimum(d0, d1)
    pcts = (1, 5, 10, 50, 90, 95, 99)
    vals = np.percentile(np.asarray(best), pcts)
    n_evals = (args.timesteps if args.sampler == "ancestral"
               else args.sampler_steps)
    print(f"sampled {args.eval_batch} rotations in {dt:.2f}s "
          f"({args.sampler}, {n_evals} model evals)")
    print("angle-to-nearest-mode percentiles (rad):")
    print("  " + "  ".join(f"{p}%: {v:.4f}" for p, v in zip(pcts, vals)))
    if args.plot:
        _plot_traces(np.asarray(traj), args)
    return np.asarray(best)


def _plot_traces(traj, args, max_chains=64):
    """Euler-angle convergence traces over the reverse chain (the
    reference's ``so3_test.py:36-70`` figure), headless matplotlib."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..ops.so3 import rmat_to_euler
    from ..viz.colors import BLUE, GREEN, ORANGE
    from ..viz.mpl import setup_pi_axis

    t_axis = np.arange(traj.shape[0])[::-1]
    x, y, z = rmat_to_euler(jnp.asarray(traj[:, :max_chains]))
    fig, axlist = plt.subplots(nrows=3, ncols=1, sharex=True)
    for ax, series, c in zip(axlist, (x, y, z), (BLUE, ORANGE, GREEN)):
        ax.plot(t_axis, np.asarray(series), alpha=0.2, c=c, lw=0.7)
        setup_pi_axis(ax)
    axlist[2].axhline(np.pi / 2, color="grey", ls="-", lw=0.5)
    axlist[2].axhline(-np.pi / 2, color="grey", ls="-", lw=0.5)
    axlist[2].set_xlabel("Reverse process steps")
    axlist[1].set_ylabel("Angle")
    out = args.plot if isinstance(args.plot, str) else "so3_toy_traces.png"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(f"wrote {out}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Toy SO(3) diffusion")
    p.add_argument("--batch", type=int, default=64)  # so3_train.py:52
    p.add_argument("--lr", type=float, default=3e-4)  # so3_train.py:63
    p.add_argument("--steps", type=int, default=400_000)  # so3_train.py:69
    p.add_argument("--d_model", type=int, default=65)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", type=str, default="weights/so3_toy")
    p.add_argument("--ckpt-every", dest="ckpt_every", type=int, default=1000)
    p.add_argument("--print-every", dest="print_every", type=int, default=10)
    p.add_argument("--log", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug-nans", dest="debug_nans", action="store_true",
                   help="enable jax_debug_nans (the torch anomaly-mode equivalent)")
    p.add_argument("--test", action="store_true")
    p.add_argument("--sampler", choices=("ancestral", "ddim", "pf"),
                   default="ancestral",
                   help="reverse chain for --test: ancestral 1000-step, "
                        "DDIM, or the exact-transport probability-flow "
                        "integrator (method='flow')")
    p.add_argument("--sampler-steps", dest="sampler_steps", type=int,
                   default=50, help="model evals for ddim/pf samplers")
    p.add_argument("--eval-batch", dest="eval_batch", type=int, default=512)
    p.add_argument("--plot", nargs="?", const=True, default=False,
                   help="save euler-angle convergence traces (optional path)")
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
