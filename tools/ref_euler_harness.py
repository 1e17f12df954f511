"""Cross-implementation parity harness for the euler-aircraft arm.

Round 2 left the flagship euler-vs-so3 aircraft comparison with an
unproven claim: the rebuild's euler arm never leaves the Haar prior
(median 2.22 rad at 400k steps) and the "structural failure" explanation
(clip/init interplay, ``/root/reference/diffusion.py:196-277``,
``aircraft_test.py:80-83``) had never been checked against the reference
implementation itself.  This harness closes that gap by driving the
REFERENCE PyTorch pipeline (read-only, ``/root/reference``) directly:

  goldens   write ``tests/goldens/euler_ref_parity.npz``: a stepwise
            reverse-chain trace of the reference
            ``ProjectedGaussianDiffusion.p_sample`` (euler state,
            ``PointCloudProj(so3=False)`` conditioning, tiny MLP
            denoiser, injected noise) plus p_losses values —
            ``tests/test_euler_ref_parity.py`` replays the identical
            chain through the rebuild and asserts stepwise agreement.
  bench     measure reference euler-arm training steps/s on CPU for the
            matched reduced config.
  train     train the reference euler arm on the same synthetic_planes
            data the rebuild's euler arm trains on (matched reduced
            config + matched val probe), JSONL loss log.
  test      evaluate a trained reference euler checkpoint with the
            reference's own ``aircraft_test.py:71-99`` protocol
            (Haar-euler init, full reverse chain, angle percentiles).

Like ``tools/make_goldens.py`` this deliberately IMPORTS the reference to
generate comparison data — test tooling, not shipped logic.  The
reference's vendored ``denoising-diffusion-pytorch`` submodule is empty
in this snapshot, so its helpers are stubbed with the standard lucidrains
semantics the rebuild documents (``processes/schedule.py``); the dead-code
``se3_transformer_pytorch`` import is stubbed out.  Two published crashes
must be patched to make the reference runnable at all (PARITY.md):

* ``PoolRN``/``PoolPos`` mask=None path: ``mask[..., None]`` on an
  already-unsqueezed mask makes the weight broadcast blow up for
  batch != seq (``/root/reference/models.py:102-105``) — patched to the
  all-ones-mask semantics obviously intended.
* ``PlaneNet.forward`` final ``out[..., 0, :]`` double-squeezes: PoolRN
  already dropped the sequence dim, so on the (B, 3) head output it
  selects batch element 0 (``/root/reference/models.py:209-210``) —
  patched to return the head output directly.

Usage:
    JAX_PLATFORMS=cpu python tools/ref_euler_harness.py goldens
    JAX_PLATFORMS=cpu python tools/ref_euler_harness.py bench --steps 20
    JAX_PLATFORMS=cpu python tools/ref_euler_harness.py train --steps 20000
    JAX_PLATFORMS=cpu python tools/ref_euler_harness.py test
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "goldens")
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def load_reference():
    """Import the reference modules with the vendored/dead imports stubbed
    and the two published crashes patched.  Returns a namespace dict."""
    import torch
    import torch.nn as nn

    # ---- stub the (empty) denoising-diffusion-pytorch submodule with the
    # standard lucidrains helper semantics (documented in SURVEY.md quirks
    # and processes/schedule.py) --------------------------------------------
    def extract(a, t, x_shape):
        b, *_ = t.shape
        out = a.gather(-1, t)
        return out.reshape(b, *((1,) * (len(x_shape) - 1)))

    def exists(x):
        return x is not None

    def default(val, d):
        if exists(val):
            return val
        return d() if callable(d) else d

    def noise_like(shape, device, repeat=False):
        if repeat:
            return torch.randn((1, *shape[1:]), device=device).repeat(
                shape[0], *((1,) * (len(shape) - 1))
            )
        return torch.randn(shape, device=device)

    def cosine_beta_schedule(timesteps, s=0.008):
        steps = timesteps + 1
        x = np.linspace(0, timesteps, steps, dtype=np.float64)
        ac = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
        ac = ac / ac[0]
        betas = 1 - (ac[1:] / ac[:-1])
        return np.clip(betas, 0.0, 0.999)

    pkg = types.ModuleType("denoising_diffusion_pytorch")
    mod = types.ModuleType("denoising_diffusion_pytorch.denoising_diffusion_pytorch")
    for f in (extract, exists, default, noise_like, cosine_beta_schedule):
        setattr(mod, f.__name__, f)
    pkg.denoising_diffusion_pytorch = mod
    sys.modules.setdefault("denoising_diffusion_pytorch", pkg)
    sys.modules.setdefault(
        "denoising_diffusion_pytorch.denoising_diffusion_pytorch", mod
    )

    # ---- stub BioPython (prot_util imports it at module level; only
    # RES_COUNT is needed here) ---------------------------------------------
    bio = types.ModuleType("Bio")
    biopdb = types.ModuleType("Bio.PDB")
    biopdb.PDBParser = type("PDBParser", (), {})
    bio.PDB = biopdb
    sys.modules.setdefault("Bio", bio)
    sys.modules.setdefault("Bio.PDB", biopdb)

    # ---- stub the dead-code se3_transformer_pytorch import ----------------
    se3pkg = types.ModuleType("se3_transformer_pytorch")
    se3mod = types.ModuleType("se3_transformer_pytorch.se3_transformer_pytorch")
    for name in ("LinearSE3", "Fiber", "NormSE3"):
        setattr(se3mod, name, type(name, (), {}))
    se3pkg.se3_transformer_pytorch = se3mod
    sys.modules.setdefault("se3_transformer_pytorch", se3pkg)
    sys.modules.setdefault(
        "se3_transformer_pytorch.se3_transformer_pytorch", se3mod
    )

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import util as ref_util  # noqa: E402
    import diffusion as ref_diffusion  # noqa: E402
    import models as ref_models  # noqa: E402

    # ---- patch the two published crashes (see module docstring) -----------
    def poolrn_forward(self, x, mask=None):
        weight = self.pool(x)
        if mask is not None:
            weight = weight * mask[..., None]
        w_sum = weight.sum(dim=-2, keepdim=True).clamp(min=1e-6)
        val = self.lin(x)
        out = (val * weight).sum(dim=-2, keepdim=True) / w_sum
        return out[..., 0, :]

    ref_models.PoolRN.forward = poolrn_forward

    def planenet_forward(self, x, t):
        x_emb = self.position_siren(x)
        t_emb = self.time_embedding(t)
        t_in = torch.cat((x_emb, t_emb[:, None, :].expand(x_emb.shape)), dim=2)
        encoding = self.encoder(t_in.transpose(0, 1)).transpose(0, 1)
        return self.out_net(encoding)  # PoolRN already dropped the seq dim

    ref_models.PlaneNet.forward = planenet_forward

    return {
        "torch": torch,
        "nn": nn,
        "util": ref_util,
        "diffusion": ref_diffusion,
        "models": ref_models,
    }


# ---------------------------------------------------------------------------
# goldens: stepwise chain trace with a tiny MLP denoiser
# ---------------------------------------------------------------------------

GOLDEN_T = 40  # short full chain: every step is recorded
GOLDEN_B = 4
GOLDEN_N = 16
GOLDEN_H = 32


def make_tiny_mlp(torch, nn, rng):
    """Deterministic tiny denoiser: flat projected cloud + t/T -> R^3.
    Weights drawn from the passed numpy rng so they can be saved exactly."""

    class TinyMLP(nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = nn.Linear(GOLDEN_N * 3 + 1, GOLDEN_H)
            self.l2 = nn.Linear(GOLDEN_H, GOLDEN_H)
            self.l3 = nn.Linear(GOLDEN_H, 3)

        def forward(self, x, t):
            flat = x.reshape(x.shape[0], -1)
            tt = (t.float() / GOLDEN_T)[:, None]
            h = torch.cat([flat, tt], dim=-1)
            h = torch.tanh(self.l1(h))
            h = torch.tanh(self.l2(h))
            return self.l3(h)

    net = TinyMLP()
    weights = {}
    with torch.no_grad():
        for name, p in net.named_parameters():
            w = rng.standard_normal(tuple(p.shape)).astype(np.float32) * 0.2
            p.copy_(torch.from_numpy(w))
            weights[name] = w
    net.eval()
    return net, weights


def cmd_goldens(args):
    ns = load_reference()
    torch, nn = ns["torch"], ns["nn"]
    ref_util, ref_diffusion, ref_models = ns["util"], ns["diffusion"], ns["models"]
    global GOLDEN_T

    from diffusion_extensions_tpu.data.shapenet import synthetic_planes

    rng = np.random.default_rng(20260817)
    data = synthetic_planes(n=GOLDEN_B, points=GOLDEN_N, seed=7)  # (B, N, 3)

    net, weights = make_tiny_mlp(torch, nn, rng)
    proc = ref_diffusion.ProjectedGaussianDiffusion(net, timesteps=GOLDEN_T)
    proc.eval()
    proj = ref_models.PointCloudProj(torch.from_numpy(data), so3=False)
    proc.projection = proj

    # Haar init rotations -> euler decomposition (aircraft_test.py:80-83)
    g = rng.standard_normal((GOLDEN_B, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(g)
    init_rots = q.astype(np.float32)
    x = torch.stack(ref_util.rmat_to_euler(torch.from_numpy(init_rots)), dim=-1)
    init_euler = x.numpy().copy()

    # fixed reverse-chain noise, injected with the exact p_sample formula
    # (diffusion.py:211-219): x <- mean + nonzero * exp(0.5 logvar) * z
    chain_noise = rng.standard_normal((GOLDEN_T, GOLDEN_B, 3)).astype(np.float32)
    states, means, logvars, eps_preds = [], [], [], []
    with torch.no_grad():
        for idx, i in enumerate(reversed(range(GOLDEN_T))):
            t = torch.full((GOLDEN_B,), i, dtype=torch.long)
            eps_preds.append(net(proj(x), t).numpy().copy())
            mean, _, logvar = proc.p_mean_variance(x, t, clip_denoised=False)
            z = torch.from_numpy(chain_noise[idx])
            nonzero = (1 - (t == 0).float()).reshape(GOLDEN_B, 1)
            x = mean + nonzero * (0.5 * logvar).exp() * z
            means.append(mean.numpy().copy())
            logvars.append(logvar.numpy().copy())
            states.append(x.numpy().copy())

    # p_losses goldens: fixed x_start/t/noise (diffusion.py:259-271)
    loss_t = np.asarray([0, 1, GOLDEN_T // 2, GOLDEN_T - 1], dtype=np.int64)
    loss_noise = rng.standard_normal((loss_t.size, GOLDEN_B, 3)).astype(np.float32)
    losses = []
    with torch.no_grad():
        for k, tv in enumerate(loss_t):
            t = torch.full((GOLDEN_B,), int(tv), dtype=torch.long)
            x_start = torch.zeros(GOLDEN_B, 3)
            losses.append(
                float(proc.p_losses(x_start, t, noise=torch.from_numpy(loss_noise[k])))
            )

    os.makedirs(OUT, exist_ok=True)
    np.savez(
        os.path.join(OUT, "euler_ref_parity.npz"),
        data=data,
        init_rots=init_rots,
        init_euler=init_euler,
        chain_noise=chain_noise,
        states=np.stack(states),
        means=np.stack(means),
        logvars=np.stack(logvars),
        eps_preds=np.stack(eps_preds),
        loss_t=loss_t,
        loss_noise=loss_noise,
        losses=np.asarray(losses, dtype=np.float64),
        betas=proc.betas.numpy(),
        posterior_log_variance_clipped=proc.posterior_log_variance_clipped.numpy(),
        timesteps=np.asarray(GOLDEN_T),
        **{f"w_{k.replace('.', '_')}": v for k, v in weights.items()},
    )
    print(f"wrote {OUT}/euler_ref_parity.npz "
          f"({GOLDEN_T} steps, final state norm "
          f"{np.linalg.norm(states[-1]):.4f})")


# ---------------------------------------------------------------------------
# matched reduced training config (feasible for eager torch on CPU)
# ---------------------------------------------------------------------------

def matched_config(args):
    return dict(
        dim=args.dim, heads=args.heads, layers=args.layers,
        samples=args.samples, batch=args.batch, lr=args.lr,
        timesteps=1000,
    )


def build_ref_euler(ns, cfg):
    torch = ns["torch"]
    net = ns["models"].PlaneNet(
        dim=cfg["dim"], heads=cfg["heads"], layers=cfg["layers"]
    )
    proc = ns["diffusion"].ProjectedGaussianDiffusion(
        net, timesteps=cfg["timesteps"]
    )
    return net, proc


def data_iterator(cfg, seed=0, n=256):
    """Same synthetic data the rebuild's euler arm trains on."""
    from diffusion_extensions_tpu.data.shapenet import synthetic_planes

    clouds = synthetic_planes(n=n, points=cfg["samples"], seed=seed)
    rng = np.random.default_rng(seed + 1)
    while True:
        idx = rng.integers(0, clouds.shape[0], size=cfg["batch"])
        yield clouds[idx]


def cmd_bench(args):
    ns = load_reference()
    torch = ns["torch"]
    cfg = matched_config(args)
    net, proc = build_ref_euler(ns, cfg)
    optim = torch.optim.Adam(net.parameters(), lr=cfg["lr"])
    truepos = torch.zeros(cfg["batch"], 3)
    it = data_iterator(cfg)
    # warmup
    for _ in range(3):
        loss = proc(truepos, ns["models"].PointCloudProj(
            torch.from_numpy(next(it)), so3=False))
        optim.zero_grad(); loss.backward(); optim.step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss = proc(truepos, ns["models"].PointCloudProj(
            torch.from_numpy(next(it)), so3=False))
        optim.zero_grad(); loss.backward(); optim.step()
    dt = time.perf_counter() - t0
    print(json.dumps({"config": cfg, "steps": args.steps,
                      "steps_per_sec": args.steps / dt}))


def cmd_train(args):
    ns = load_reference()
    torch = ns["torch"]
    torch.manual_seed(args.seed)
    cfg = matched_config(args)
    net, proc = build_ref_euler(ns, cfg)
    optim = torch.optim.Adam(net.parameters(), lr=cfg["lr"])
    truepos = torch.zeros(cfg["batch"], 3)
    it = data_iterator(cfg, seed=args.seed)

    # frozen validation probe, mirroring the rebuild's aircraft val MSE
    # (and the reference's own frozen (t, noise, batch) probe,
    # aircraft_rotate.py:80-101): fixed batch, fixed t, fixed noise
    vrng = np.random.default_rng(args.seed + 123)
    val_batch = torch.from_numpy(next(data_iterator(cfg, seed=args.seed + 5)))
    val_t = torch.from_numpy(
        vrng.integers(0, cfg["timesteps"], size=cfg["batch"]).astype(np.int64)
    )
    val_noise = torch.from_numpy(
        vrng.standard_normal((cfg["batch"], 3)).astype(np.float32)
    )

    os.makedirs(os.path.dirname(args.log) or ".", exist_ok=True)
    logf = open(args.log, "a")
    t0 = time.perf_counter()
    for step in range(1, args.steps + 1):
        batch = torch.from_numpy(next(it))
        proj = ns["models"].PointCloudProj(batch, so3=False)
        loss = proc(truepos, proj)
        optim.zero_grad(); loss.backward(); optim.step()
        if step % args.print_every == 0 or step == args.steps:
            with torch.no_grad():
                proc.projection = ns["models"].PointCloudProj(
                    val_batch, so3=False)
                val_loss = float(proc.p_losses(
                    torch.zeros(cfg["batch"], 3), val_t, noise=val_noise))
            rec = {"step": step, "loss": float(loss), "val_loss": val_loss,
                   "steps_per_sec": step / (time.perf_counter() - t0)}
            print(json.dumps(rec)); logf.write(json.dumps(rec) + "\n")
            logf.flush()
        if step % args.ckpt_every == 0 or step == args.steps:
            torch.save(net.state_dict(), args.ckpt)
    logf.close()


def cmd_test(args):
    ns = load_reference()
    torch = ns["torch"]
    torch.manual_seed(args.seed + 1)
    cfg = matched_config(args)
    net, proc = build_ref_euler(ns, cfg)
    net.load_state_dict(torch.load(args.ckpt, map_location="cpu"))
    net.eval()

    from diffusion_extensions_tpu.data.shapenet import synthetic_planes

    clouds = synthetic_planes(n=args.eval_shapes, points=cfg["samples"],
                              seed=999)
    ref_util = ns["util"]
    angles = []
    with torch.no_grad():
        for b in range(0, args.eval_shapes, cfg["batch"]):
            data = torch.from_numpy(clouds[b:b + cfg["batch"]])
            if data.shape[0] < cfg["batch"]:
                break
            proc.projection = ns["models"].PointCloudProj(data, so3=False)
            for samp in range(args.eval_samples):
                # aircraft_test.py:80-83 init: euler of Haar-QR rotations
                R, _ = torch.linalg.qr(torch.randn((cfg["batch"], 3, 3)))
                x = torch.stack(ref_util.rmat_to_euler(R), dim=-1)
                for i in reversed(range(proc.num_timesteps)):
                    x = proc.p_sample(
                        x, torch.full((cfg["batch"],), i, dtype=torch.long)
                    ).detach()
                rmats = ref_util.euler_to_rmat(*torch.unbind(x, -1))
                _, ang = ref_util.rmat_to_aa(rmats)
                angles.append(ang.squeeze(-1).numpy().copy())
                print(f"batch {b} sample {samp}: "
                      f"median {np.median(np.concatenate(angles)):.4f}")
    angles = np.concatenate(angles)
    pcts = (1, 5, 10, 50, 90, 95, 99)
    vals = np.percentile(angles, pcts)
    rec = {"arm": "reference-euler", "config": cfg, "ckpt": args.ckpt,
           "count": int(angles.size),
           "percentiles": {str(p): float(v) for p, v in zip(pcts, vals)}}
    print(json.dumps(rec))
    with open(args.out, "w") as f:
        json.dump({**rec, "angles": angles.tolist()}, f)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("goldens")
    for name in ("bench", "train", "test"):
        sp = sub.add_parser(name)
        sp.add_argument("--dim", type=int, default=128)
        sp.add_argument("--heads", type=int, default=2)
        sp.add_argument("--layers", type=int, default=2)
        sp.add_argument("--samples", type=int, default=64)
        sp.add_argument("--batch", type=int, default=32)
        sp.add_argument("--lr", type=float, default=1e-4)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--steps", type=int, default=20 if name == "bench" else 20000)
        if name == "train":
            sp.add_argument("--log", type=str,
                            default="results/ref_euler_train.jsonl")
            sp.add_argument("--ckpt", type=str,
                            default="weights/ref_euler_matched.pt")
            sp.add_argument("--print-every", dest="print_every", type=int,
                            default=200)
            sp.add_argument("--ckpt-every", dest="ckpt_every", type=int,
                            default=2000)
        if name == "test":
            sp.add_argument("--ckpt", type=str,
                            default="weights/ref_euler_matched.pt")
            sp.add_argument("--out", type=str,
                            default="results/ref_euler_matched_eval.json")
            sp.add_argument("--eval-shapes", dest="eval_shapes", type=int,
                            default=32)
            sp.add_argument("--eval-samples", dest="eval_samples", type=int,
                            default=2)
    args = p.parse_args()
    {"goldens": cmd_goldens, "bench": cmd_bench,
     "train": cmd_train, "test": cmd_test}[args.cmd](args)


if __name__ == "__main__":
    main()
