"""Step-component profiler for the flagship aircraft training step.

Reproduces the BENCHMARKS.md step breakdown: times each nested stage of the
train step (model fwd -> loss fwd -> fwd+bwd -> +adam -> dp step) with the
pipelined methodology that is valid on this relay'd TPU (issue N calls,
block once; per-call blocking overstates cost ~5x here).

Usage:  python tools/profile_step.py [--batch 32] [--samples 256] [--bf16]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from diffusion_extensions_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from diffusion_extensions_tpu.data.shapenet import synthetic_planes
from diffusion_extensions_tpu.experiments.aircraft import make_loss_fn
from diffusion_extensions_tpu.models.planenet import PlaneNet
from diffusion_extensions_tpu.parallel.dp import make_dp_train_step
from diffusion_extensions_tpu.parallel.mesh import make_mesh
from diffusion_extensions_tpu.processes.so3 import ProjectedSO3Diffusion
from diffusion_extensions_tpu.train.state import TrainState


def timeit(name, f, *a, n=100):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.3f} ms")
    return dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args(argv)

    B, P = args.batch, args.samples
    model = PlaneNet(
        dim=args.dim, heads=args.heads, layers=args.layers, bf16=args.bf16
    )
    process = ProjectedSO3Diffusion(timesteps=1000)
    truepos = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((B, P, 3)), jnp.zeros((B,), jnp.int32))
    batch = jnp.asarray(synthetic_planes(B, points=P, seed=0))
    tx = optax.adam(1e-4)
    state = TrainState.create(params, tx, key)
    loss_fn = make_loss_fn(model, process, truepos, so3=True)

    timeit("model fwd       ", jax.jit(lambda p, x, t: model.apply(p, x, t)),
           params, batch, jnp.zeros((B,), jnp.int32))
    timeit("loss fwd        ", jax.jit(loss_fn), params, key, batch)
    timeit("loss fwd+bwd    ", jax.jit(jax.value_and_grad(loss_fn)),
           params, key, batch)

    opt_state = tx.init(params)

    def full(params, opt_state, key, batch):
        l, g = jax.value_and_grad(loss_fn)(params, key, batch)
        u, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, l

    timeit("grad + adam     ", jax.jit(full), params, opt_state, key, batch)

    mesh = make_mesh()
    step_fn = make_dp_train_step(loss_fn, tx, mesh, donate=False)
    timeit("dp shard_map    ", step_fn, state, batch)


if __name__ == "__main__":
    main()
