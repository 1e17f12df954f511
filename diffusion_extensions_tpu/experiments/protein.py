"""Protein heterodimer docking: SE(3) vs Euler projected diffusion.

TPU-native equivalent of ``prot_train.py`` (train) and ``prot_test.py`` +
``prot_diags.py`` (eval):

    python -m diffusion_extensions_tpu.experiments.protein --se3 --steps 5000
    python -m diffusion_extensions_tpu.experiments.protein --se3 --test

Same knobs (batch/lr/dim/heads/t_depth/c_depth/--se3,
``prot_train.py:20-59``).  Proteins are padded once to static bucket
lengths (``data/pdb.py:pad_prot_batch``) and everything downstream is
masked dense compute — no ragged tensors, no per-forward ``pad_sequence``.

The reference's epoch loop calls ``optim.step()`` once per *epoch*
(de-facto whole-epoch gradient accumulation, ``prot_train.py:104-108`` — a
documented quirk, probably unintended); the default here is per-batch
stepping; ``--epoch-accum`` reproduces the reference behavior.

Falls back to synthetic protein pairs when ``data/BPTI_dock`` is absent.
"""
from __future__ import annotations

import argparse
import json
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pdb import (
    ProtPairDataset,
    move_prots_np,
    pad_prot_batch,
    random_affine_np,
    synthetic_prot_pair,
)
from ..models.projections import ProtProjection
from ..models.protnet import ProtNet
from ..ops.se3 import AffineT
from ..ops.so3 import euler_to_rmat, rmat_to_aa
from ..processes.euler import ProjectedEulerDiffusion
from ..processes.se3 import ProjectedSE3Diffusion
from ..train.loop import MetricLogger, Throughput
from ..train.optim import add_optim_flags, make_optimizer
from ..train.state import TrainState, restore_checkpoint, save_checkpoint

AUGMENT = True  # prot_train.py:10
SAMPLES = 4  # prot_test.py:12


def load_pairs(args):
    try:
        ds = ProtPairDataset(args.data_root)
        if len(ds) == 0:
            raise FileNotFoundError(args.data_root)
        pairs = [ds[i] for i in range(len(ds))]
        print(f"loaded {len(pairs)} protein pairs from {args.data_root}")
    except (FileNotFoundError, OSError):
        rng = np.random.default_rng(0)
        pairs = [synthetic_prot_pair(rng) for _ in range(16)]
        print(f"{args.data_root} not found; using 16 synthetic protein pairs")
    return pairs


def build(args):
    model = ProtNet(
        dim=args.dim,
        heads=args.heads,
        t_depth=args.t_depth,
        c_depth=args.c_depth,
        se3=args.se3,
        bf16=args.bf16,
        frame_pool=args.frame_pool,
        cross_depth=args.cross_depth,
        rel_frame=args.rel_frame,
        equiv_head=args.equiv_head,
        conv_impl=args.conv_impl,
    )
    if args.se3:
        process = ProjectedSE3Diffusion(
            timesteps=args.timesteps, clip_shift=args.clip_shift
        )
    else:
        process = ProjectedEulerDiffusion.create(timesteps=args.timesteps)
    return model, process


def true_pos_for(args, b):
    if args.se3:
        return AffineT(
            jnp.broadcast_to(jnp.eye(3), (b, 3, 3)), jnp.zeros((b, 3))
        )
    return jnp.zeros((b, 6))


def make_batches(pairs, args, rng):
    """Augmented, padded batches for one epoch (host-side; collation is
    vectorised numpy, augmentation a 3x3 QR per element)."""
    order = rng.permutation(len(pairs))
    # static bucket lengths over the dataset -> one compiled program
    lr = max(p[0].positions.shape[0] for p in pairs)
    ll = max(p[1].positions.shape[0] for p in pairs)
    if args.batch > len(pairs):
        # batch larger than the pair set (TPU batches vs a small dataset):
        # one resampled-with-replacement batch per "epoch" — dropping the
        # ragged tail would otherwise yield zero batches and never step
        batches = [rng.choice(len(pairs), size=args.batch, replace=True)]
    else:
        usable = len(order) - len(order) % args.batch  # drop the ragged tail
        batches = [order[i : i + args.batch] for i in range(0, usable, args.batch)]
    for idx in batches:
        chosen = []
        for j in idx:
            rec, lig = pairs[j]
            if AUGMENT and not args.no_augment:
                rot, shift = random_affine_np(rng)
                rec, lig = move_prots_np(rot, shift, (rec, lig))
            chosen.append((rec, lig))
        yield pad_prot_batch(chosen, receptor_len=lr, ligand_len=ll)


def train(args):
    model, process = build(args)
    pairs = load_pairs(args)
    rng = np.random.default_rng(args.seed)
    example = pad_prot_batch(
        [pairs[0]] * args.batch,
        receptor_len=max(p[0].positions.shape[0] for p in pairs),
        ligand_len=max(p[1].positions.shape[0] for p in pairs),
    )

    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = model.init(
        init_key, example, jnp.zeros((args.batch,), jnp.int32)
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"ProtNet params: {n_params/1e6:.2f}M")
    tx = make_optimizer(
        args.lr, clip=args.clip, schedule=args.lr_schedule,
        total_steps=args.steps, impl=args.opt_impl,
        state_dtype=args.opt_state_dtype,
    )
    state = TrainState.create(params, tx, key)
    if args.resume:
        state = restore_checkpoint(args.ckpt, state)

    truepos = true_pos_for(args, args.batch)

    # Shared dp/K-fusion train step (parallel/dp.py): K sequential optimizer
    # steps per dispatch amortize the tunneled-relay per-execution overhead
    # (the same knob that carries the aircraft headline), and the
    # wandb.watch-equivalent grad/param norms (prot_train.py:76) are only
    # computed on the final fused sub-step — the one whose metrics reach
    # the JSONL sink — instead of paying a full HBM sweep of grads + params
    # on every step.
    K = max(args.steps_per_call, 1)
    if args.epoch_accum and K != 1:
        print("--epoch-accum uses steps_per_call=1")
        K = 1

    def loss_fn(params, key, batch):
        b = batch.receptor_mask.shape[0]
        proj = ProtProjection(batch, se3=args.se3)
        return process.loss(
            lambda x, t: model.apply(params, x, t),
            key,
            true_pos_for(args, b),
            projection=proj,
        )

    from ..parallel.dp import make_dp_train_step
    from ..parallel.mesh import make_mesh

    # dp axis sized to divide the batch (single real chip -> dp=1; the
    # 8-virtual-device CPU test env with small batches -> a subset mesh)
    n_dp = math.gcd(len(jax.devices()), args.batch)
    mesh = make_mesh(devices=jax.devices()[:n_dp])
    step_fn = make_dp_train_step(
        loss_fn, tx, mesh, steps_per_call=K, log_norms=True,
        per_layer_norms=args.log_norms_per_layer,
    )
    # replicate the state over the (possibly subset) mesh: a freshly
    # created/restored state lives on device 0 only, which jit rejects
    # when the shard_map mesh spans more devices
    from jax.sharding import NamedSharding, PartitionSpec

    state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))

    @jax.jit
    def accum_fn(carry_grads, state, batch, count):
        key = jax.random.fold_in(state.key, count)

        def loss_fn(params):
            proj = ProtProjection(batch, se3=args.se3)
            return process.loss(
                lambda x, t: model.apply(params, x, t), key, truepos,
                projection=proj,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        carry = jax.tree_util.tree_map(jnp.add, carry_grads, grads)
        return carry, loss

    logger = MetricLogger(jsonl_path=args.log, print_every=args.print_every)
    meter = Throughput()
    step = int(state.step)
    last_save = step
    epoch = 0
    if args.epoch_accum:
        while step < args.steps:
            # reference semantics: accumulate grads over the whole epoch,
            # one optimizer step per epoch (prot_train.py:104-108)
            grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            count = 0
            for batch in make_batches(pairs, args, rng):
                grads, loss = accum_fn(grads, state, batch, count)
                count += 1
                logger.log(step + count, {"loss": loss})
            key = jax.random.fold_in(state.key, state.step)
            _, next_key = jax.random.split(key)
            state = state.apply_gradients(tx, grads, next_key)
            step += max(count, 1)
            epoch += 1
            # step-based save cadence: with small (synthetic) pair sets an
            # epoch is a few steps and each save hauls the full 1.5 GB
            # state pytree through the device relay — epoch-based saving
            # would dominate the run.
            if step - last_save >= args.ckpt_every or step >= args.steps:
                save_checkpoint(args.ckpt, state)
                last_save = step
    else:

        def endless():
            # epochs chained into one stream: every batch is freshly
            # Haar-augmented by make_batches
            while True:
                yield from make_batches(pairs, args, rng)

        gen = endless()
        tail_fn = None  # K=1 step for the final partial group (ADVICE r4:
        # without it, steps not divisible by K overshot by up to K-1)
        while step < args.steps:
            k_now = min(K, args.steps - step)
            if k_now < K:
                if tail_fn is None:
                    tail_fn = make_dp_train_step(
                        loss_fn, tx, mesh, steps_per_call=1, log_norms=True,
                        per_layer_norms=args.log_norms_per_layer,
                    )
                for _ in range(k_now):
                    state, metrics = tail_fn(state, next(gen))
                    meter.tick()
                step += k_now
                logger.log(step, {**metrics,
                                  "steps_per_sec": meter.steps_per_sec
                                  or float("nan")})
                save_checkpoint(args.ckpt, state)
                last_save = step
                break
            if K == 1:
                batch = next(gen)
            else:
                # K DISTINCT fresh batches stacked on the scan axis (a
                # group may span epochs).  Grouping must never lower the
                # augmented protocol's fresh-pose rate: the first round-4
                # version reused one batch K times whenever an epoch had
                # fewer than K batches (true for every synthetic-pair
                # config), silently cutting augmentation diversity 8x.
                batch = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs),
                    *(next(gen) for _ in range(K)),
                )
            state, metrics = step_fn(state, batch)
            for _ in range(K):
                meter.tick()
            prev = step
            step += K
            if step // args.print_every != prev // args.print_every:
                logger.log(
                    step,
                    {**metrics,
                     "steps_per_sec": meter.steps_per_sec or float("nan")},
                )
            if step - last_save >= args.ckpt_every or step >= args.steps:
                save_checkpoint(args.ckpt, state)
                last_save = step
    if step > last_save:
        save_checkpoint(args.ckpt, state)
    return state


def test(args):
    """Sample docking transforms, report angle/shift percentiles
    (``prot_test.py:100-147`` + ``prot_diags.py:23-51``)."""
    model, process = build(args)
    pairs = load_pairs(args)
    rng = np.random.default_rng(args.seed + 99)
    lr = max(p[0].positions.shape[0] for p in pairs)
    ll = max(p[1].positions.shape[0] for p in pairs)

    example = pad_prot_batch([pairs[0]] * args.batch, lr, ll)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, example, jnp.zeros((args.batch,), jnp.int32))
    state = restore_checkpoint(
        args.ckpt,
        TrainState.create(
            params,
            make_optimizer(
                args.lr, clip=args.clip, schedule=args.lr_schedule,
                total_steps=args.steps,
            ),
            key,
        ),
        params_only=True,
    )
    if int(state.step) == 0:
        print("warning: no checkpoint found; evaluating untrained model")
    # device_put once and pass params as a jit ARGUMENT: closing over the
    # restored host arrays would inline ~0.5 GB of literals into the HLO
    # (the relay rejects the compile request) and re-upload them per call
    params = jax.device_put(state.params)

    @jax.jit
    def sample_fn(params, k, batch):
        denoise = lambda x, t: model.apply(params, x, t)
        proj = ProtProjection(batch, se3=args.se3)
        if args.se3:
            if args.sampler == "ddim":
                return process.ddim_sample_loop(
                    denoise, k, (args.batch,), num_steps=args.sampler_steps,
                    projection=proj)
            if args.sampler == "pf":
                return process.pf_sample_loop(
                    denoise, k, (args.batch,), num_steps=args.sampler_steps,
                    projection=proj,
                    method=getattr(args, "pf_method", "flow"))
            if args.sampler == "picard":
                return process.parallel_sample_loop(
                    denoise, k, (args.batch,), num_steps=args.sampler_steps,
                    projection=proj)
            return process.p_sample_loop(denoise, k, (args.batch,), proj)
        out = process.p_sample_loop(
            denoise, k, (args.batch, 6), projection=proj
        )
        eul = out[..., :3]
        return AffineT(
            euler_to_rmat(eul[..., 0], eul[..., 1], eul[..., 2]), out[..., 3:]
        )

    # mirror the train-side guard (make_batches): with batch > len(pairs)
    # the strided range below yields zero batches and np.concatenate([])
    # raises — evaluate one resampled-with-replacement batch instead
    if args.batch > len(pairs):
        batch_indices = [rng.choice(len(pairs), size=args.batch, replace=True)]
    else:
        batch_indices = [
            np.arange(b, b + args.batch)
            for b in range(0, len(pairs) - len(pairs) % args.batch, args.batch)
        ]
    angles, shifts = [], []
    for b, idx in enumerate(batch_indices):
        chosen = []
        for j in idx:
            rec, lig = pairs[j]
            if AUGMENT and not args.no_augment:
                rot, shift = random_affine_np(rng)
                rec, lig = move_prots_np(rot, shift, (rec, lig))
            chosen.append((rec, lig))
        batch = pad_prot_batch(chosen, lr, ll)
        for s in range(SAMPLES):
            # stride by SAMPLES so keys cannot collide across batches even
            # if the per-pose sample count is ever raised
            k = jax.random.fold_in(
                jax.random.PRNGKey(args.seed + 1), b * SAMPLES + s
            )
            aff = sample_fn(params, k, batch)
            _, ang = rmat_to_aa(aff.rot)
            angles.append(np.asarray(ang)[..., 0])
            shifts.append(np.linalg.norm(np.asarray(aff.shift), axis=-1))

    angles = np.concatenate(angles)
    shifts = np.concatenate(shifts)
    diff_type = "se3" if args.se3 else "eul"
    if args.se3 and args.sampler != "ancestral":
        diff_type += f"_{args.sampler}{args.sampler_steps}"
    pcts = (1, 5, 10, 50, 90, 95, 99)
    a_sorted, s_sorted = np.sort(angles), np.sort(shifts)
    idxs = [int(len(a_sorted) * p / 100) for p in pcts]
    print(f"{len(angles)} samples ({diff_type})")
    print("percentiles " + " ".join(f"& {p}%" for p in pcts) + r" \\")
    print("angle " + " ".join(f"& {a_sorted[i]:.2f}" for i in idxs) + r" \\")
    print("shift " + " ".join(f"& {s_sorted[i]:.2f}" for i in idxs) + r" \\")
    import os

    # key the artifact by the checkpoint it evaluates (not just by the
    # diffusion type): every arm in the results matrix gets a distinct
    # file, so arm labels never depend on manual renames between runs
    arm = os.path.basename(os.path.normpath(args.ckpt)) or diff_type
    if args.se3 and args.sampler != "ancestral":
        arm += f"_{args.sampler}{args.sampler_steps}"
    os.makedirs("results", exist_ok=True)
    with open(f"results/prot_samples_{arm}.json", "w") as f:
        json.dump({"angles": angles.tolist(), "shifts": shifts.tolist()}, f)
    return angles, shifts


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Protein docking diffusion")
    p.add_argument("--batch", type=int, default=4)  # prot_train.py:21-22
    p.add_argument("--lr", type=float, default=1e-4)
    add_optim_flags(p)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--t_depth", type=int, default=12)
    p.add_argument("--c_depth", type=int, default=8)
    p.add_argument("--se3", action="store_true")
    p.add_argument("--clip-shift", dest="clip_shift", type=float, default=75.0,
                   help="clamp the sampler's predicted x0 shift to +-this "
                        "(SE(3) clip_denoised analogue; 0 = off, reference "
                        "parity — the published sampler random-walks)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--frame-pool", dest="frame_pool", action="store_true",
                   help="add gated frame-matrix pooling to the readout "
                        "(beyond-reference: makes the rotation block of the "
                        "docking transform directly observable; the "
                        "reference readout pools features+positions only)")
    p.add_argument("--cross-depth", dest="cross_depth", type=int, default=0,
                   help="receptor<->ligand cross-attention rounds after the "
                        "self-attention encoders (beyond-reference: makes "
                        "the bilinear cross-chain rotation comparison "
                        "representable before pooling; 0 = reference parity)")
    p.add_argument("--conv-impl", dest="conv_impl",
                   choices=("matmul", "xla_conv", "sum3"), default="xla_conv",
                   help="residue conv lowering (same math/params; see "
                        "BENCHMARKS.md protein roofline A/B)")
    p.add_argument("--rel-frame", dest="rel_frame", action="store_true",
                   help="append the bilinear relative-frame readout "
                        "P_lig @ P_rec^T of gated-pooled frames "
                        "(beyond-reference; see ProtNet.rel_frame)")
    p.add_argument("--equiv-head", dest="equiv_head", action="store_true",
                   help="receptor-frame-equivariant output head: predict "
                        "in the pooled receptor frame and rotate out — "
                        "reduces the Haar-augmented task to the canonical "
                        "one (beyond-reference; see ProtNet.equiv_head)")
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--steps", type=int, default=250_000,
                   help="total batch steps (~1000 epochs of BPTI_dock)")
    p.add_argument("--epoch-accum", dest="epoch_accum", action="store_true",
                   help="reproduce the reference's one-optimizer-step-per-"
                        "epoch gradient accumulation (prot_train.py:104-108)")
    p.add_argument("--steps-per-call", dest="steps_per_call", type=int,
                   default=8,
                   help="optimizer steps fused into one dispatch via "
                        "lax.scan (amortizes per-execution overhead on the "
                        "tunneled relay; same SGD math).  NOTE: only the "
                        "final sub-step's loss/norms reach the JSONL log, "
                        "so curve density is ~1/K of the per-step protocol; "
                        "use 1 for dense curves / matched-protocol runs")
    p.add_argument("--log-norms-per-layer", dest="log_norms_per_layer",
                   action="store_true",
                   help="log one grad norm per top-level module as "
                        "grad_norm/<module> JSONL keys (per-layer half of "
                        "the reference's wandb.watch, prot_train.py:76)")
    p.add_argument("--no-augment", dest="no_augment", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-root", dest="data_root", type=str,
                   default="data/BPTI_dock")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--ckpt-every", dest="ckpt_every", type=int, default=10_000,
                   help="checkpoint save interval in steps")
    p.add_argument("--print-every", dest="print_every", type=int, default=10)
    p.add_argument("--log", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug-nans", dest="debug_nans", action="store_true",
                   help="enable jax_debug_nans (the torch anomaly-mode equivalent)")
    p.add_argument("--test", action="store_true")
    p.add_argument("--sampler",
                   choices=("ancestral", "ddim", "pf", "picard"),
                   default="ancestral",
                   help="SE(3) eval sampler: the reference's 1000-step "
                        "ancestral chain, or the beyond-reference "
                        "DDIM / probability-flow (exact quantile "
                        "transport) chains")
    p.add_argument("--sampler-steps", dest="sampler_steps", type=int,
                   default=50, help="model evals for --sampler ddim/pf")
    p.add_argument("--pf-method", dest="pf_method",
                   choices=("flow", "flow-state", "euler", "heun"),
                   default="flow",
                   help="--sampler pf variant: 'flow' (prediction-anchored "
                        "exact transport, production) or the measured-bad "
                        "research variants (warned at runtime)")
    args = p.parse_args(argv)
    if args.sampler == "pf" and args.pf_method != "flow":
        import warnings

        warnings.warn(
            f"--pf-method {args.pf_method} is a research variant with a "
            "MEASURED quality defect on SE(3) docking (flow-state: "
            "re-anchoring tail blowup, rot p99 3.14 / shift p99 33.6 on "
            "the 240k checkpoint; euler/heun: saturating-score "
            "under-transport, BENCHMARKS.md 'Probability-flow sampling'). "
            "Use --pf-method flow or --sampler ddim for production.",
            stacklevel=1,
        )
    if args.ckpt is None:
        args.ckpt = f"weights/protein_{'se3' if args.se3 else 'eul'}"
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
