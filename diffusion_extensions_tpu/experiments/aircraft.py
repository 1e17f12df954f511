"""Aircraft rotational alignment — the north-star benchmark workload.

TPU-native equivalent of ``aircraft_rotate.py`` (train) and
``aircraft_test.py`` + ``aircraft_diags.py`` (eval):

    python -m diffusion_extensions_tpu.experiments.aircraft --so3 --steps 10000
    python -m diffusion_extensions_tpu.experiments.aircraft --so3 --test

Same knobs as the reference (batch/lr/samples/dim/heads/layers/--so3,
``aircraft_rotate.py:14-55``).  The state is the identity rotation (or zero
euler) and the denoiser sees the point cloud rendered through the projection
``data @ R^T``; training is one jitted DP step over the device mesh.

Falls back to ``synthetic_planes`` when the ShapeNet HDF5 files are absent
(training/bench exercise the identical compute path).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.shapenet import BatchLoader, ShapeNet, synthetic_planes
from ..models.planenet import PlaneNet
from ..models.projections import PointCloudProj
from ..ops.so3 import euler_to_rmat, rmat_to_aa
from ..parallel.dp import make_dp_train_step, shard_batch
from ..parallel.mesh import make_mesh
from ..processes.r3 import ProjectedGaussianDiffusion
from ..processes.so3 import ProjectedSO3Diffusion
from ..train.loop import MetricLogger, Throughput
from ..train.optim import add_optim_flags, make_optimizer
from ..train.state import TrainState, restore_checkpoint, save_checkpoint

SAMPLES_PER_SHAPE = 8  # aircraft_test.py:9


def load_data(split: str, args) -> np.ndarray:
    try:
        ds = ShapeNet(split, (0,), root=args.data_root)
        return ds.data
    except (FileNotFoundError, OSError):
        n = 1024 if split == "train" else 128
        seed = {"train": 0, "valid": 1, "test": 2}[split]
        print(f"ShapeNet not found under {args.data_root}; "
              f"using synthetic_planes({n}) for split={split}")
        return synthetic_planes(n, seed=seed)


def build(args):
    model = PlaneNet(
        dim=args.dim, heads=args.heads, layers=args.layers, bf16=args.bf16,
        moe_experts=getattr(args, "moe_experts", 0),
        moe_dispatch=getattr(args, "moe_dispatch", "scatter"),
    )
    if args.so3:
        process = ProjectedSO3Diffusion(timesteps=args.timesteps)
        truepos = jnp.broadcast_to(jnp.eye(3), (args.batch, 3, 3))
    else:
        process = ProjectedGaussianDiffusion(timesteps=args.timesteps)
        truepos = jnp.zeros((args.batch, 3))
    return model, process, truepos


def make_loss_fn(model, process, truepos, so3: bool, aux_weight: float = 0.01):
    moe = getattr(model, "moe_experts", 0) > 0

    def loss_fn(params, key, batch):
        proj = PointCloudProj(batch, so3=so3)
        b = batch.shape[0]
        aux = []

        def denoise(x, t):
            if moe:
                # pull the sown Switch load-balance loss (models/moe.py);
                # a plain apply() would silently drop it and let the
                # router collapse onto one expert.
                # ASSUMPTION: process.loss calls denoise exactly once,
                # directly (not under lax.scan/cond/checkpoint) — true for
                # every process in this repo.  Appending a traced value to
                # a Python list from inside traced control flow would leak
                # tracers; if a future loss evaluates the model inside a
                # scan, return the aux loss through the process instead.
                out, st = model.apply(params, x, t, mutable=["losses"])
                aux.append(sum(jax.tree_util.tree_leaves(st["losses"])))
                return out
            return model.apply(params, x, t)

        base = process.loss(denoise, key, truepos[:b], projection=proj)
        if aux:
            base = base + aux_weight * sum(aux) / len(aux)
        return base

    return loss_fn


def train(args):
    model, process, truepos = build(args)
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    x_init = jnp.zeros((args.batch, args.samples, 3))
    t_init = jnp.zeros((args.batch,), dtype=jnp.int32)
    # keep only the params collection: with --moe-experts, init() also
    # returns the sown "losses" collection, which must not leak into
    # TrainState/Adam/checkpoints as a bogus leaf
    params = {"params": model.init(init_key, x_init, t_init)["params"]}
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"PlaneNet params: {n_params/1e6:.2f}M")
    tx = make_optimizer(
        args.lr, clip=args.clip, schedule=args.lr_schedule,
        total_steps=args.steps, impl=args.opt_impl,
        state_dtype=args.opt_state_dtype,
    )
    state = TrainState.create(params, tx, key)
    if args.resume:
        state = restore_checkpoint(args.ckpt, state)

    loss_fn = make_loss_fn(model, process, truepos, args.so3)
    K = max(args.steps_per_call, 1)
    if args.sp > 1 and args.samples % args.sp != 0:
        # batch_spec would silently fall back to dp-only while the mesh
        # still spends devices on the sp axis — refuse loudly instead
        raise SystemExit(
            f"--sp {args.sp} does not divide --samples {args.samples}; "
            "sequence parallelism needs a divisible points axis"
        )
    if args.tp > 1 or args.sp > 1 or args.fsdp:
        # dp x sp x tp GSPMD step: global-batch program, kernels sharded on
        # "tp", the points axis on "sp"; --fsdp additionally shards params +
        # Adam moments over "dp" at rest
        from ..parallel.gspmd import make_gspmd_train_step

        mesh = make_mesh([("dp", -1), ("sp", args.sp), ("tp", args.tp)])
        step_fn = make_gspmd_train_step(loss_fn, tx, mesh, fsdp=args.fsdp)
        if K != 1:
            print("--tp/--sp/--fsdp uses steps_per_call=1")
            K = 1
    else:
        mesh = make_mesh()
        step_fn = make_dp_train_step(
            loss_fn, tx, mesh, steps_per_call=K,
            log_norms=args.log_norms or args.log_norms_per_layer,
            per_layer_norms=args.log_norms_per_layer,
        )

    train_data = load_data("train", args)
    loader = None
    if not args.no_native:
        try:
            from ..data.native import NativeBatchLoader, native_available

            if native_available():
                loader = NativeBatchLoader(
                    train_data, args.batch, samples=args.samples,
                    seed=args.seed, n_threads=2,
                )
                print("using native threaded batch loader")
        except Exception as e:
            print(f"native loader unavailable ({e}); using numpy loader")
    if loader is None:
        loader = iter(
            BatchLoader(
                train_data, args.batch, samples=args.samples, seed=args.seed
            )
        )

    # Frozen validation probe (reference: aircraft_rotate.py:83-101): fixed
    # (t, noise, batch); per-cycle denoiser MSE against the frozen target.
    val_data = load_data("valid", args)
    v_clouds = val_data[: args.batch]
    if v_clouds.shape[1] > args.samples:
        # random point subsample (not a head slice — see test()): the
        # frozen probe should see the same cloud statistics training does
        vrng = np.random.default_rng(args.seed + 29)
        vcols = vrng.integers(
            0, v_clouds.shape[1], size=(len(v_clouds), args.samples)
        )
        v_clouds = np.take_along_axis(v_clouds, vcols[..., None], axis=1)
    v_batch = jnp.asarray(v_clouds)
    t_v = jax.random.randint(
        jax.random.PRNGKey(7), (args.batch,), 0, process.num_timesteps
    )
    from ..processes.schedule import extract
    from ..ops.so3 import log_rmat_vec

    eps_v = extract(process.schedule.sqrt_one_minus_alphas_cumprod, t_v)
    if args.so3:
        noise_v = process.q_table.sample(jax.random.PRNGKey(8), t_v)
        x_noisy_v = process.q_sample(truepos, t_v, noise_v)
        target_v = log_rmat_vec(noise_v) / eps_v[..., None]
    else:
        noise_v = jax.random.normal(jax.random.PRNGKey(8), (args.batch, 3))
        x_noisy_v = process.q_sample(truepos, t_v, noise_v)
        target_v = noise_v
    proj_x_noisy_v = PointCloudProj(v_batch, so3=args.so3)(x_noisy_v)

    @jax.jit
    def val_loss(params):
        pred = model.apply(params, proj_x_noisy_v, t_v)
        return jnp.mean((pred - target_v) ** 2)

    expert_fracs = None
    if getattr(model, "moe_experts", 0) > 0:
        # per-layer expert token fractions on the frozen probe — the
        # load-balance / utilization trace for the MoE arm (sown into the
        # "diag" collection by models/moe.py)
        @jax.jit
        def expert_fracs(params):
            _, st = model.apply(
                params, proj_x_noisy_v, t_v, mutable=["losses", "diag"]
            )
            rows = jax.tree_util.tree_leaves(st.get("diag", {}))
            return jnp.stack(rows) if rows else jnp.zeros((0,))

    logger = MetricLogger(jsonl_path=args.log, print_every=args.print_every)
    meter = Throughput()
    profile_step = None
    if args.profile_dir:
        from ..train.loop import trace_window

        profile_step = trace_window(args.profile_dir)
    for i in range(int(state.step), args.steps, K):
        if profile_step is not None:
            profile_step(i)
        if K == 1:
            batch = shard_batch(next(loader), mesh)
        else:
            batch = jnp.stack([next(loader) for _ in range(K)])
        state, metrics = step_fn(state, batch)
        for _ in range(K):
            meter.tick()
        i = i + K - 1
        if (i + 1) % args.print_every == 0:
            row = {
                **metrics,
                "test_loss": val_loss(state.params),
                "steps_per_sec": meter.steps_per_sec or float("nan"),
            }
            if expert_fracs is not None:
                fr = np.asarray(expert_fracs(state.params))  # (layers, E)
                row["expert_frac_min"] = float(fr.min())
                row["expert_frac_max"] = float(fr.max())
                row["expert_fracs"] = [
                    [round(float(v), 4) for v in layer] for layer in fr
                ]
            logger.log(i + 1, row)
        if (i + 1) % args.ckpt_every == 0 or (i + 1) == args.steps:
            save_checkpoint(args.ckpt, state)
    if hasattr(loader, "close"):
        loader.close()  # join native worker threads before interpreter exit
    return state


def test(args):
    """Per-shape 8-sample angle-error percentile table
    (``aircraft_test.py:71-99`` + ``aircraft_diags.py:17-23``)."""
    model, process, truepos = build(args)
    key = jax.random.PRNGKey(args.seed)
    params = {
        "params": model.init(
            key,
            jnp.zeros((1, args.samples, 3)),
            jnp.zeros((1,), jnp.int32),
        )["params"]
    }
    # same tx as train(): the opt-state pytree structure must match the
    # checkpoint for orbax restore
    tx = make_optimizer(
        args.lr, clip=args.clip, schedule=args.lr_schedule,
        total_steps=args.steps, impl=args.opt_impl,
        state_dtype=args.opt_state_dtype,
    )
    state = restore_checkpoint(
        args.ckpt, TrainState.create(params, tx, key), params_only=True
    )
    if int(state.step) == 0:
        print("warning: no checkpoint found; evaluating untrained model")
    # params as a jit argument (not a closure): restored host arrays would
    # otherwise be inlined into the HLO as literals and re-sent per compile
    params = jax.device_put(state.params)

    # random per-shape point subsampling, like training and like the
    # reference's ShapeNet(samples=...) multinomial draw at test time
    # (datasets.py:39-40, aircraft_test.py:30-40).  A head slice
    # ``[:, :samples]`` would be wrong for any structured point order: the
    # synthetic generator fills parts sequentially, so the head is the
    # (near-axially-symmetric) fuselage only — which floors the achievable
    # angle error for every arm (caught in round 3; see BENCHMARKS.md).
    test_data = load_data("test", args)
    if test_data.shape[1] > args.samples:
        srng = np.random.default_rng(args.seed + 17)
        cols = srng.integers(
            0, test_data.shape[1], size=(len(test_data), args.samples)
        )
        test_data = np.take_along_axis(test_data, cols[..., None], axis=1)
    results = []

    @jax.jit
    def sample_batch(params, k, batch):
        denoise = lambda x, t: model.apply(params, x, t)
        proj = PointCloudProj(batch, so3=args.so3)
        if args.so3:
            return process.p_sample_loop(denoise, k, (batch.shape[0],), proj)
        k, k_init = jax.random.split(k)
        if args.euler_init == "marginal":
            # beyond-reference causal probe: init from the forward-process
            # marginal q(x_{T-1}|x_0=0) = N(0, 1-acp_{T-1}) instead of the
            # reference's Haar-euler decomposition, which places the chain
            # far outside any state the denoiser saw in training
            sig_T = process.schedule.sqrt_one_minus_alphas_cumprod[-1]
            x_init = sig_T * jax.random.normal(k_init, (batch.shape[0], 3))
        else:
            # reference euler init: euler decomposition of Haar-QR
            # rotations (aircraft_test.py:80-83)
            from ..ops.so3 import haar_rotations, rmat_to_euler

            r0 = haar_rotations(k_init, (batch.shape[0],))
            x_init = jnp.stack(rmat_to_euler(r0), axis=-1)
        eul = process.p_sample_loop(
            denoise, k, (batch.shape[0], 3), projection=proj, x_init=x_init
        )
        return euler_to_rmat(eul[..., 0], eul[..., 1], eul[..., 2])

    for b in range(0, len(test_data), args.batch):
        batch_np = test_data[b : b + args.batch]
        n_valid = len(batch_np)
        if n_valid < args.batch:
            # pad the ragged tail to the full batch shape: a different
            # batch size would recompile the whole 1000-step scan
            pad = np.repeat(batch_np[-1:], args.batch - n_valid, axis=0)
            batch_np = np.concatenate([batch_np, pad], axis=0)
        batch = jnp.asarray(batch_np)
        for s in range(SAMPLES_PER_SHAPE):
            k = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), b * 100 + s)
            rots = sample_batch(params, k, batch)
            _, angle = rmat_to_aa(rots)
            results.append(np.asarray(angle)[:n_valid, 0])
        if args.max_shapes and b + args.batch >= args.max_shapes:
            break

    res = np.concatenate(results)
    diff_type = "so3" if args.so3 else "eul"
    if not args.so3 and args.euler_init != "haar":
        diff_type = f"eul_{args.euler_init}"
    out_path = os.path.join(
        os.path.dirname(args.ckpt) or ".", f"results_aircraft_{diff_type}.npy"
    )
    np.save(out_path, res)
    pcts = (1, 5, 10, 50, 90, 95, 99)
    res_sorted = np.sort(res)
    idxs = [int(len(res_sorted) * p / 100) for p in pcts]
    print(f"{len(res)} samples ({diff_type}); angle-error percentiles (rad):")
    print("percentiles " + " ".join(f"& {p}%" for p in pcts) + r" \\")
    print(
        diff_type
        + " "
        + " ".join(f"& {res_sorted[i]:.2f}" for i in idxs)
        + r" \\"
    )
    return res


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Aircraft rotation args")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    add_optim_flags(p)
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--so3", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="run transformer matmuls in bfloat16 on the MXU")
    p.add_argument("--no-native", dest="no_native", action="store_true",
                   help="disable the C++ threaded batch loader")
    p.add_argument("--steps-per-call", dest="steps_per_call", type=int,
                   default=1, help="fuse K optimizer steps per dispatch")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size (dp x tp GSPMD step)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3 layout: shard params + optimizer moments "
                        "over the dp axis at rest (GSPMD step)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel mesh size: shard the points axis "
                        "over 'sp' (GSPMD step)")
    p.add_argument("--moe-experts", dest="moe_experts", type=int, default=0,
                   help="swap the FFN for a Switch MoE with this many "
                        "experts (ep-shardable, models/moe.py); 0 = dense")
    p.add_argument("--moe-dispatch", dest="moe_dispatch", default="scatter",
                   choices=("onehot", "scatter"),
                   help="MoE token dispatch: one-hot (T,E,C) einsums (MXU "
                        "work, O(T^2) scaling) or O(T*D) slot scatter; "
                        "numerically equivalent (tests/test_moe.py)")
    p.add_argument("--log-norms", dest="log_norms", action="store_true",
                   help="log grad/param global norms (wandb.watch equivalent)")
    p.add_argument("--log-norms-per-layer", dest="log_norms_per_layer",
                   action="store_true",
                   help="additionally log one grad norm per top-level "
                        "module as grad_norm/<module> JSONL keys (the "
                        "per-layer half of wandb.watch; implies "
                        "--log-norms)")
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--steps", type=int, default=1_000_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-root", dest="data_root", type=str,
                   default="data/shapenetcorev2_hdf5_2048")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--ckpt-every", dest="ckpt_every", type=int, default=1000)
    p.add_argument("--print-every", dest="print_every", type=int, default=10)
    p.add_argument("--log", type=str, default=None)
    p.add_argument("--profile-dir", dest="profile_dir", type=str, default=None,
                   help="capture an XLA profiler trace of steps 50-60 here")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug-nans", dest="debug_nans", action="store_true",
                   help="enable jax_debug_nans (the torch anomaly-mode equivalent)")
    p.add_argument("--test", action="store_true")
    p.add_argument("--euler-init", dest="euler_init",
                   choices=("haar", "marginal"), default="haar",
                   help="euler-arm chain init at eval: the reference's "
                        "Haar-euler decomposition, or the forward-marginal "
                        "Gaussian (beyond-ref causal probe)")
    p.add_argument("--max-shapes", dest="max_shapes", type=int, default=None)
    args = p.parse_args(argv)
    if args.ckpt is None:
        args.ckpt = f"weights/aircraft_{'so3' if args.so3 else 'eul'}"
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
