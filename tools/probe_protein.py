"""Per-block predictability probe for a trained protein docking model.

For a checkpoint, measures the denoiser's rotation-block and shift-block
MSE against the zero-predictor baseline at several timesteps — the
diagnostic that localises *which* block of the docking transform the model
has actually learned (reference protocol has no equivalent; this is what
exposed that the reference readout never learns the rotation block and
that round 1's "rotation docks exactly" was a NaN artifact — see
BENCHMARKS.md, protein section).

    python -m tools.probe_protein --ckpt weights/protein_se3_r2
    python -m tools.probe_protein --ckpt weights/protein_se3_fp_r2 --frame-pool
"""
from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from diffusion_extensions_tpu.data.pdb import (
    move_prots_np,
    pad_prot_batch,
    random_affine_np,
    synthetic_prot_pair,
)
from diffusion_extensions_tpu.models.projections import ProtProjection
from diffusion_extensions_tpu.models.protnet import ProtNet
from diffusion_extensions_tpu.ops.se3 import AffineT
from diffusion_extensions_tpu.ops.so3 import log_rmat_vec
from diffusion_extensions_tpu.processes.schedule import extract
from diffusion_extensions_tpu.processes.se3 import ProjectedSE3Diffusion
from diffusion_extensions_tpu.train.state import TrainState, restore_checkpoint


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--t_depth", type=int, default=12)
    p.add_argument("--c_depth", type=int, default=8)
    p.add_argument("--frame-pool", dest="frame_pool", action="store_true")
    p.add_argument("--cross-depth", dest="cross_depth", type=int, default=0)
    p.add_argument("--rel-frame", dest="rel_frame", action="store_true")
    p.add_argument("--equiv-head", dest="equiv_head", action="store_true")
    p.add_argument("--augment", action="store_true",
                   help="probe under the reference's Haar SE(3) "
                        "augmentation (prot_train.py:95-100) instead of "
                        "canonical poses")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--timesteps", type=int, default=1000)
    args = p.parse_args(argv)

    B = args.batch
    rng = np.random.default_rng(0)
    pairs = [synthetic_prot_pair(rng) for _ in range(16)]
    lr = max(q[0].positions.shape[0] for q in pairs)
    ll = max(q[1].positions.shape[0] for q in pairs)
    def collate(round_idx):
        chosen = []
        for i in range(B):
            rec, lig = pairs[(i + round_idx) % 16]
            if args.augment:
                rot, shift = random_affine_np(rng)
                rec, lig = move_prots_np(rot, shift, (rec, lig))
            chosen.append((rec, lig))
        return pad_prot_batch(chosen, lr, ll)

    batch = collate(0)

    model = ProtNet(
        dim=args.dim, heads=args.heads, t_depth=args.t_depth,
        c_depth=args.c_depth, se3=True, frame_pool=args.frame_pool,
        cross_depth=args.cross_depth, rel_frame=args.rel_frame,
        equiv_head=args.equiv_head,
    )
    proc = ProjectedSE3Diffusion(timesteps=args.timesteps)
    key = jax.random.PRNGKey(0)
    params0 = model.init(key, batch, jnp.zeros((B,), jnp.int32))
    state = restore_checkpoint(
        args.ckpt, TrainState.create(params0, optax.adam(1e-4), key),
        params_only=True,
    )
    print(f"ckpt step: {int(state.step)}")
    params = jax.device_put(state.params)
    truepos = AffineT(jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), jnp.zeros((B, 3)))

    @jax.jit
    def probe(params, k, t_scalar, batch):
        t = jnp.full((B,), t_scalar, jnp.int32)
        eps = extract(proc.schedule.sqrt_one_minus_alphas_cumprod, t, 1)
        noise = proc.sample_noise(k, t)
        x_noisy = proc.q_sample(truepos, t, noise)
        x_in = ProtProjection(batch, se3=True)(x_noisy)
        pred = model.apply(params, x_in, t)
        tgt_rot = log_rmat_vec(noise.rot) / eps
        tgt_shift = noise.shift / (eps * proc.shift_scale)
        mse = lambda a, b: jnp.mean((a - b) ** 2)
        return (mse(pred.rot_g, tgt_rot), mse(0.0 * tgt_rot, tgt_rot),
                mse(pred.shift_g, tgt_shift), mse(0.0 * tgt_shift, tgt_shift))

    for t_s in (20, 100, 300, 600, 900):
        acc = np.zeros(4)
        for r in range(args.rounds):
            k = jax.random.fold_in(jax.random.PRNGKey(42), t_s * 10 + r)
            rb = collate(r) if args.augment else batch
            acc += np.array([float(x) for x in probe(params, k, t_s, rb)])
        acc /= args.rounds
        print(f"t={t_s:4d}  rot: model {acc[0]:.4f} vs zero {acc[1]:.4f} | "
              f"shift: model {acc[2]:.4f} vs zero {acc[3]:.4f}")


if __name__ == "__main__":
    main()
