"""MFU probe: XLA-reported FLOPs of the benchmark train step vs measured
throughput vs the chip's peak — the roofline context for the headline
steps/sec number (BENCHMARKS.md).

Usage: python tools/mfu_probe.py [--steps-per-call K]
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

from diffusion_extensions_tpu.data.shapenet import synthetic_planes
from diffusion_extensions_tpu.experiments.aircraft import make_loss_fn
from diffusion_extensions_tpu.models.planenet import PlaneNet
from diffusion_extensions_tpu.parallel.dp import make_dp_train_step, shard_batch
from diffusion_extensions_tpu.parallel.mesh import make_mesh
from diffusion_extensions_tpu.processes.so3 import ProjectedSO3Diffusion
from diffusion_extensions_tpu.train.state import TrainState

# TPU v5e (v5 lite): 197 bf16 TFLOP/s peak per chip, 819 GB/s HBM.
PEAK_BF16 = 197e12
HBM_BW = 819e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps-per-call", dest="K", type=int, default=8)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()
    K = args.K

    model = PlaneNet(dim=512, heads=4, layers=4, bf16=True)
    process = ProjectedSO3Diffusion(timesteps=1000)
    truepos = jnp.broadcast_to(jnp.eye(3), (args.batch, 3, 3))
    key = jax.random.PRNGKey(0)
    params = model.init(
        key, jnp.zeros((args.batch, 256, 3)), jnp.zeros((args.batch,), jnp.int32)
    )
    tx = optax.adam(1e-4)
    state = TrainState.create(params, tx, key)
    mesh = make_mesh()
    loss_fn = make_loss_fn(model, process, truepos, so3=True)
    step_fn = make_dp_train_step(loss_fn, tx, mesh, steps_per_call=K)

    data = synthetic_planes(64, points=256, seed=0)
    b = jnp.asarray(data[np.arange(K * args.batch) % len(data)])
    if K > 1:
        b = jax.device_put(b.reshape(K, args.batch, 256, 3))
    else:
        b = shard_batch(b, mesh)

    lowered = step_fn.lower(state, b)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    # NOTE: XLA cost analysis counts a while/scan body ONCE regardless of
    # trip count (verified: K=1 and K=8 both report 693.6 GFLOP), so the
    # reported flops ARE the per-step flops.
    flops_per_step = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))

    # measure
    for _ in range(3):
        state, m = step_fn(state, b)
    jax.block_until_ready(state.params)
    n_calls = max(160 // K, 10)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, m = step_fn(state, b)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    sec_per_call = dt / n_calls
    steps_per_sec = K / sec_per_call
    achieved = flops_per_step * steps_per_sec
    print(json.dumps({
        "steps_per_call": K,
        "steps_per_sec": round(steps_per_sec, 2),
        "xla_flops_per_step": flops_per_step,
        "xla_bytes_per_call": bytes_acc,
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu_vs_bf16_peak": round(achieved / PEAK_BF16, 4),
        "speed_of_light_steps_per_sec_compute": round(PEAK_BF16 / flops_per_step, 1),
    }))


if __name__ == "__main__":
    main()
