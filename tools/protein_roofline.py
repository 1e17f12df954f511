"""ProtNet train-step roofline breakdown (VERDICT r3 item 1).

Measures, on the real chip, for the reference protein config (d1024, 8
heads, 12 layers, c_depth 8; `/root/reference/prot_train.py:21-47`):

* XLA cost-analysis FLOPs and wall time of the FULL train step and of
  its components (encoder stack fwd, conv embed stack fwd, model fwd,
  fwd+bwd), giving the attention/conv/FFN split;
* the pad fraction of the static buckets for the batch actually used
  (synthetic pairs are fixed-length 120/60, so pad fraction is 0 there —
  the number is computed from the masks, not assumed);
* an A/B over the round-4 layout knobs: fused receptor+ligand encoder
  pass (`fuse_chains`) and fused QKV projection (`fused_qkv`).

Usage: python tools/protein_roofline.py [--batch 16] [--quick]
Writes one JSON line to stdout (plus a human table to stderr).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusion_extensions_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from diffusion_extensions_tpu.data.pdb import (  # noqa: E402
    pad_prot_batch,
    synthetic_prot_pair,
)
from diffusion_extensions_tpu.models.projections import ProtProjection  # noqa: E402
from diffusion_extensions_tpu.models.protnet import ProtNet, _ResConv  # noqa: E402
from diffusion_extensions_tpu.models.layers import TransformerEncoder  # noqa: E402
from diffusion_extensions_tpu.ops.se3 import AffineT  # noqa: E402
from diffusion_extensions_tpu.processes.se3 import ProjectedSE3Diffusion  # noqa: E402
from diffusion_extensions_tpu.train.state import TrainState  # noqa: E402

PEAK_BF16 = 197e12


def flops_of(fn, *args):
    try:
        a = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        return float(a.get("flops", float("nan")))
    except Exception:
        return float("nan")


def time_fn(fn, *args, n=30, warmup=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def build(batch, fuse_chains=True, fused_qkv=False, conv_impl="matmul",
          dim=1024, t_depth=12, c_depth=8, heads=8, log_norms=False,
          steps_per_call=1, opt_impl="optax", clip=0.0, opt_state_dtype="f32"):
    rng = np.random.default_rng(0)
    pairs = [synthetic_prot_pair(rng) for _ in range(16)]
    lr = max(p[0].positions.shape[0] for p in pairs)
    ll = max(p[1].positions.shape[0] for p in pairs)
    pb = pad_prot_batch([pairs[i % len(pairs)] for i in range(batch)], lr, ll)
    # pin on device: pad_prot_batch collates in host numpy (driver fix),
    # and roofline arms reuse this batch every timed call
    pb = jax.tree_util.tree_map(jnp.asarray, pb)
    model = ProtNet(
        dim=dim, heads=heads, t_depth=t_depth, c_depth=c_depth, se3=True,
        bf16=True, fuse_chains=fuse_chains, fused_qkv=fused_qkv,
        conv_impl=conv_impl,
    )
    process = ProjectedSE3Diffusion(timesteps=1000)
    key = jax.random.PRNGKey(0)
    params = model.init(key, pb, jnp.zeros((batch,), jnp.int32))
    from diffusion_extensions_tpu.train.optim import make_optimizer

    tx = make_optimizer(1e-4, clip=clip, impl=opt_impl,
                        state_dtype=opt_state_dtype)
    state = TrainState.create(params, tx, key)
    truepos = AffineT(
        jnp.broadcast_to(jnp.eye(3), (batch, 3, 3)), jnp.zeros((batch, 3))
    )

    def one_step(state, pb):
        key = jax.random.fold_in(state.key, state.step)
        step_key, next_key = jax.random.split(key)

        def loss_fn(params):
            proj = ProtProjection(pb, se3=True)
            return process.loss(
                lambda x, t: model.apply(params, x, t), step_key, truepos,
                projection=proj,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(tx, grads, next_key)
        metrics = {"loss": loss}
        if log_norms:
            # real outputs (not 0*x, which XLA would DCE): same cost the
            # driver pays for its wandb.watch-equivalent norm logging
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["param_norm"] = optax.global_norm(new_state.params)
        return new_state, metrics

    if steps_per_call == 1:
        return model, pb, state, one_step

    def fused(state, pbs):
        return jax.lax.scan(one_step, state, pbs)

    pbs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (steps_per_call,) + x.shape), pb
    )
    return model, pbs, state, fused


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--t-depth", dest="t_depth", type=int, default=12)
    p.add_argument("--c-depth", dest="c_depth", type=int, default=8)
    p.add_argument("--only-ab", dest="only_ab", default="",
                   help="comma-separated A/B arm tags to run (skips the\n                   component decomposition); empty = full sweep")
    args = p.parse_args()
    b = args.batch
    n = 10 if args.quick else 30
    sizes = dict(dim=args.dim, heads=args.heads, t_depth=args.t_depth,
                 c_depth=args.c_depth)

    model, pb, state, step_fn = build(b, **sizes)
    t_vec = jnp.zeros((b,), jnp.int32)

    # pad fraction of the static buckets, from the actual masks
    valid = float(jnp.sum(pb.receptor_mask) + jnp.sum(pb.ligand_mask))
    total = float(pb.receptor_mask.size + pb.ligand_mask.size)
    pad_frac = 1.0 - valid / total

    result = {"batch": b, "pad_fraction": round(pad_frac, 4)}

    # --- component FLOPs/time ------------------------------------------
    fwd = lambda params, pb: model.apply(params, pb, t_vec)
    lr, ll = pb.receptor.positions.shape[1], pb.ligand.positions.shape[1]
    dim = args.dim

    enc = TransformerEncoder(dim, args.heads, args.t_depth, final_norm=True,
                             dtype=jnp.bfloat16)
    feats = jnp.zeros((b, lr + ll, dim), jnp.float32)
    enc_params = enc.init(jax.random.PRNGKey(1), feats)
    enc_fwd = lambda p, x: enc.apply(p, x)

    res_in = jnp.zeros((b, lr, 21), jnp.float32)
    conv = _ResConv(dim, max(dim // 4, 8), args.c_depth, dtype=jnp.bfloat16)
    conv_params = conv.init(jax.random.PRNGKey(2), res_in)
    conv_fwd = lambda p, x: conv.apply(p, x)
    conv_x = _ResConv(dim, max(dim // 4, 8), args.c_depth,
                      dtype=jnp.bfloat16, impl="xla_conv")
    conv_x_fwd = lambda p, x: conv_x.apply(p, x)
    conv_s = _ResConv(dim, max(dim // 4, 8), args.c_depth,
                      dtype=jnp.bfloat16, impl="sum3")
    conv_s_fwd = lambda p, x: conv_s.apply(p, x)

    # grad-only (no optimizer update): isolates fwd+bwd from Adam + noise
    process = ProjectedSE3Diffusion(timesteps=1000)
    truepos = AffineT(
        jnp.broadcast_to(jnp.eye(3), (b, 3, 3)), jnp.zeros((b, 3))
    )

    def grad_only(params, pb):
        def loss_of(params):
            proj = ProtProjection(pb, se3=True)
            return process.loss(
                lambda x, t: model.apply(params, x, t),
                jax.random.PRNGKey(3), truepos, projection=proj,
            )
        return jax.value_and_grad(loss_of)(params)

    # noise/projection/loss machinery with the model replaced by a no-op
    # readout: everything in process.loss EXCEPT the ProtNet fwd/bwd
    from diffusion_extensions_tpu.ops.se3 import AffineGrad

    def nomodel(params, pb):
        def loss_of(p):
            proj = ProtProjection(pb, se3=True)
            scale = p["s"]

            def trivial(x, t):
                m = jnp.mean(x.ligand.positions, axis=(1, 2)) * scale
                return AffineGrad(
                    jnp.broadcast_to(m[:, None], (b, 3)),
                    jnp.broadcast_to(m[:, None], (b, 3)),
                )

            return process.loss(
                trivial, jax.random.PRNGKey(3), truepos, projection=proj
            )
        return jax.value_and_grad(loss_of)({"s": jnp.ones(())})

    # optimizer update alone (Adam moments over the full param tree)
    tx = optax.adam(1e-4)
    grads0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    def opt_only(state):
        return state.apply_gradients(tx, grads0, state.key)

    rows = {}
    for name, fn, fargs in (
        ("train_step", step_fn, (state, pb)),
        ("grad_only", grad_only, (state.params, pb)),
        ("loss_nomodel", nomodel, (state.params, pb)),
        ("opt_update", opt_only, (state,)),
        ("model_fwd", fwd, (state.params, pb)),
        ("encoder12_fwd", enc_fwd, (enc_params, feats)),
        ("conv_stack_fwd_rec", conv_fwd, (conv_params, res_in)),
        ("conv_stack_fwd_rec_xla_conv", conv_x_fwd, (conv_params, res_in)),
        ("conv_stack_fwd_rec_sum3", conv_s_fwd, (conv_params, res_in)),
    ) if not args.only_ab else ():
        fl = flops_of(fn, *fargs)
        dt = time_fn(fn, *fargs, n=n, warmup=3)
        rows[name] = {
            "gflops": round(fl / 1e9, 2) if np.isfinite(fl) else None,
            "ms": round(dt * 1e3, 3),
            "tflops_per_s": round(fl / dt / 1e12, 1)
            if np.isfinite(fl)
            else None,
            "mfu": round(fl / dt / PEAK_BF16, 4) if np.isfinite(fl) else None,
        }
        print(f"[roofline] {name}: {rows[name]}", file=sys.stderr)
    result["components"] = rows

    # --- layout A/B -----------------------------------------------------
    ab = {}
    for tag, kw in (
        ("fused_chains", {}),
        ("two_pass", dict(fuse_chains=False)),
        ("fused_chains+fused_qkv", dict(fused_qkv=True)),
        ("xla_conv", dict(conv_impl="xla_conv")),
        ("k8", dict(steps_per_call=8)),
        ("k8+norms", dict(steps_per_call=8, log_norms=True)),
        ("norms", dict(log_norms=True)),
        ("fused_adam", dict(opt_impl="fused")),
        ("clip_chain", dict(clip=1.0)),
        ("clip_fused", dict(clip=1.0, opt_impl="fused")),
        ("sum3_conv", dict(conv_impl="sum3")),
        ("xla_conv+fused_adam", dict(conv_impl="xla_conv", opt_impl="fused")),
        ("xla_conv+bf16_state",
         dict(conv_impl="xla_conv", opt_impl="fused",
              opt_state_dtype="bf16")),
        # bench protein_train_b* production config + K-fused dispatch
        # (VERDICT r4 item 6: does K-fusion lift the latency-bound b4 row?)
        ("xla_conv+k8", dict(conv_impl="xla_conv", steps_per_call=8)),
        ("xla_conv+k8+bf16_state",
         dict(conv_impl="xla_conv", steps_per_call=8, opt_impl="fused",
              opt_state_dtype="bf16")),
    ):
        if args.only_ab and tag not in args.only_ab.split(","):
            continue
        k = kw.get("steps_per_call", 1)
        _, pb2, st2, sf2 = build(b, **kw, **sizes)
        dt = time_fn(sf2, st2, pb2, n=max(n // k, 4), warmup=3) / k
        # XLA cost analysis counts a lax.scan body ONCE (not per trip), so
        # the K-fused program's reported flops are already per-step — do
        # NOT divide by k (the r4b log's k8 MFU rows are wrong for this)
        fl = flops_of(sf2, st2, pb2)
        ab[tag] = {
            "steps_per_sec": round(1.0 / dt, 2),
            "mfu": round(fl / dt / PEAK_BF16, 4) if np.isfinite(fl) else None,
        }
        print(f"[roofline] A/B {tag}: {ab[tag]}", file=sys.stderr)
    result["ab"] = ab

    print(json.dumps(result))


if __name__ == "__main__":
    main()
