"""Generate golden test fixtures from the reference implementation.

Runs the reference PyTorch code (read-only, at /root/reference) on fixed
seeded inputs and saves outputs as .npz under tests/goldens/.  Committed
goldens let the test suite verify numerical parity without importing torch
or the reference at test time.

Usage:  python tools/make_goldens.py
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "goldens")

sys.path.insert(0, REF)

import torch  # noqa: E402

torch.manual_seed(0)

import util as ref_util  # noqa: E402
import distributions as ref_dist  # noqa: E402


def t2n(x):
    return x.detach().cpu().numpy()


def random_rotations(rng, n):
    """Haar-ish rotations from QR of iid normals (det fixed to +1)."""
    g = rng.standard_normal((n, 3, 3)).astype(np.float32)
    q, r = np.linalg.qr(g)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[..., None, :]
    det = np.linalg.det(q)
    q[..., :, 0] *= det[..., None]
    return q.astype(np.float32)


def make_so3_goldens():
    rng = np.random.default_rng(1234)
    rots = random_rotations(rng, 64)
    # Include edge cases: identity, pi about x/y/z and a skew axis, tiny angle
    eye = np.eye(3, dtype=np.float32)
    pi_x = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    pi_y = np.diag([-1.0, 1.0, -1.0]).astype(np.float32)
    pi_z = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    edge = np.stack([eye, pi_x, pi_y, pi_z])
    rots_all = np.concatenate([rots, edge], axis=0)

    tr = torch.from_numpy(rots_all)
    log = ref_util.log_rmat(tr)
    axis, angle = ref_util.rmat_to_aa(tr)

    scalars = rng.uniform(0.0, 1.5, size=(rots_all.shape[0],)).astype(np.float32)
    scaled = ref_util.so3_scale(tr, torch.from_numpy(scalars))

    rots_b = torch.from_numpy(random_rotations(rng, rots_all.shape[0]))
    weight = torch.from_numpy(
        rng.uniform(0.0, 1.0, size=(rots_all.shape[0], 1)).astype(np.float32)
    )
    lerped = ref_util.so3_lerp(tr, rots_b, weight)

    eul = rng.uniform(-np.pi, np.pi, size=(32, 3)).astype(np.float32)
    eul_t = torch.from_numpy(eul)
    r_eul = ref_util.euler_to_rmat(eul_t[:, 0], eul_t[:, 1], eul_t[:, 2])
    ex, ey, ez = ref_util.rmat_to_euler(torch.from_numpy(rots))

    six = rng.standard_normal((32, 6)).astype(np.float32)
    r_six = ref_util.six2rmat(torch.from_numpy(six))
    six_back = ref_util.rmat2six(tr)

    quat = rng.standard_normal((32, 4)).astype(np.float32)
    r_quat = ref_util.quat_to_rmat(torch.from_numpy(quat))

    dist = ref_util.rmat_dist(tr, rots_b)
    cos_dist = ref_util.rmat_cosine_dist(tr, rots_b)
    gauss_k = ref_util.rmat_gaussian_kernel(tr, rots_b)

    vecs = rng.standard_normal((32, 3)).astype(np.float32)
    skews = ref_util.vec2skew(torch.from_numpy(vecs))

    axes_aa = rng.standard_normal((32, 3)).astype(np.float32)
    angs_aa = rng.uniform(0.0, np.pi, size=(32, 1)).astype(np.float32)
    r_aa = ref_util.aa_to_rmat(torch.from_numpy(axes_aa), torch.from_numpy(angs_aa))

    np.savez(
        os.path.join(OUT, "so3.npz"),
        rots=rots_all,
        log=t2n(log),
        axis=t2n(axis),
        angle=t2n(angle),
        scalars=scalars,
        scaled=t2n(scaled),
        rots_b=t2n(rots_b),
        weight=t2n(weight),
        lerped=t2n(lerped),
        eul=eul,
        r_eul=t2n(r_eul),
        rots_plain=rots,
        ex=t2n(ex),
        ey=t2n(ey),
        ez=t2n(ez),
        six=six,
        r_six=t2n(r_six),
        six_back=t2n(six_back),
        quat=quat,
        r_quat=t2n(r_quat),
        dist=t2n(dist),
        cos_dist=t2n(cos_dist),
        gauss_k=t2n(gauss_k),
        vecs=vecs,
        skews=t2n(skews),
        axes_aa=axes_aa,
        angs_aa=angs_aa,
        r_aa=t2n(r_aa),
    )
    print("so3.npz written")


def make_igso3_goldens():
    # Density over a (t, eps) grid, incl. t = 0 and t = pi endpoints.
    t = np.concatenate(
        [
            np.array([0.0], dtype=np.float64),
            np.linspace(1e-4, np.pi, 200, dtype=np.float64),
        ]
    )
    eps = np.array([0.005, 0.01, 0.02, 0.05, 0.1, 0.25, 0.5, 1.0, 1.5], dtype=np.float64)

    dens = np.zeros((eps.size, t.size), dtype=np.float32)
    for i, e in enumerate(eps):
        d = ref_dist.IsotropicGaussianSO3(torch.tensor(float(e)))
        dens[i] = t2n(d._eps_ft(torch.from_numpy(t)))

    # CDF tables for a handful of eps values (reference layout: (999, B)).
    eps_tab = np.array([0.05, 0.1, 0.5, 1.0], dtype=np.float32)
    d = ref_dist.IsotropicGaussianSO3(torch.from_numpy(eps_tab))
    trap = t2n(d.trap)  # (999, 4)
    trap_loc = t2n(d.trap_loc)[:, 0]  # (999,)

    # log_prob on a batch of rotations (finite-density region: eps = 0.5)
    rng = np.random.default_rng(7)
    rots = random_rotations(rng, 64)
    d2 = ref_dist.IsotropicGaussianSO3(torch.tensor(0.5))
    lp = t2n(d2.log_prob(torch.from_numpy(rots)))

    # 20k sampled rotation angles from the reference sampler (for
    # cross-implementation distribution tests)
    torch.manual_seed(123)
    d3 = ref_dist.IsotropicGaussianSO3(torch.tensor(0.5))
    samp = d3.sample((20000,))
    from util import rmat_to_aa as ref_rmat_to_aa
    _, ang = ref_rmat_to_aa(samp)
    sampled_angles = t2n(ang)[:, 0]

    np.savez(
        os.path.join(OUT, "igso3.npz"),
        sampled_angles_eps05=sampled_angles,
        t=t.astype(np.float32),
        eps=eps.astype(np.float32),
        dens=dens,
        eps_tab=eps_tab,
        trap=trap,
        trap_loc=trap_loc,
        rots=rots,
        log_prob_eps05=lp,
    )
    print("igso3.npz written")


def _stub_ddpm_helpers():
    """The reference imports helpers from a git submodule that is not checked
    out in this snapshot (``diffusion.py:8-14``; ``.gitmodules``).  Provide
    the standard lucidrains semantics so the reference classes import."""
    import types

    import torch as _torch

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
        return _torch.randn(shape, device=device)

    def cosine_beta_schedule(timesteps, s=0.008):
        steps = timesteps + 1
        x = np.linspace(0, timesteps, steps)
        alphas_cumprod = (
            np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
        )
        alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
        betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
        return np.clip(betas, 0, 0.999)

    pkg = types.ModuleType("denoising_diffusion_pytorch")
    mod = types.ModuleType("denoising_diffusion_pytorch.denoising_diffusion_pytorch")
    for f in (extract, exists, default, noise_like, cosine_beta_schedule):
        setattr(mod, f.__name__, f)
    pkg.denoising_diffusion_pytorch = mod
    sys.modules["denoising_diffusion_pytorch"] = pkg
    sys.modules["denoising_diffusion_pytorch.denoising_diffusion_pytorch"] = mod


def make_process_goldens():
    """Deterministic process math from the reference classes, driven with an
    identical betas array so schedule buffers line up."""
    _stub_ddpm_helpers()
    sys.path.insert(0, REPO)
    from diffusion_extensions_tpu.processes.schedule import cosine_beta_schedule

    import diffusion as ref_diff  # reference module

    betas = cosine_beta_schedule(100)  # small T for compact goldens
    ident = torch.nn.Identity()

    g = ref_diff.GaussianDiffusion(
        ident, image_size=None, timesteps=100, betas=betas
    )
    rng = np.random.default_rng(42)
    t = torch.from_numpy(rng.integers(0, 100, size=(16,)))
    x = torch.from_numpy(rng.standard_normal((16, 3)).astype(np.float32))
    noise = torch.from_numpy(rng.standard_normal((16, 3)).astype(np.float32))
    q_samp = g.q_sample(x, t, noise)
    pred_x0 = g.predict_start_from_noise(x, t, noise)
    post_mean, post_var, post_logvar = g.q_posterior(x, q_samp, t)

    s = ref_diff.SO3Diffusion(ident, timesteps=100, betas=betas)
    rots = random_rotations(rng, 16)
    rots_noise = random_rotations(rng, 16)
    tr, trn = torch.from_numpy(rots), torch.from_numpy(rots_noise)
    so3_q_samp = s.q_sample(tr, t, trn)
    nv = torch.from_numpy(rng.standard_normal((16, 3)).astype(np.float32))
    so3_pred_x0 = s.predict_start_from_noise(tr, t, nv)
    so3_post_mean, _, _ = s.q_posterior(tr, so3_q_samp, t)

    e = ref_diff.SE3Diffusion(ident, timesteps=100, betas=betas)
    import util as ref_util

    shift = torch.from_numpy(rng.standard_normal((16, 3)).astype(np.float32))
    shift_n = torch.from_numpy(rng.standard_normal((16, 3)).astype(np.float32))
    aff = ref_util.AffineT(tr, shift)
    aff_n = ref_util.AffineT(trn, shift_n)
    se3_q = e.q_sample(aff, t, aff_n)
    grad = ref_util.AffineGrad(nv, shift_n)
    se3_pred = e.predict_start_from_noise(aff, t, grad)

    np.savez(
        os.path.join(OUT, "processes.npz"),
        betas=betas.astype(np.float32),
        sqrt_acp=t2n(g.sqrt_alphas_cumprod),
        sqrt_om_acp=t2n(g.sqrt_one_minus_alphas_cumprod),
        sqrt_recip_acp=t2n(g.sqrt_recip_alphas_cumprod),
        sqrt_recipm1_acp=t2n(g.sqrt_recipm1_alphas_cumprod),
        post_var_buf=t2n(g.posterior_variance),
        post_logvar_buf=t2n(g.posterior_log_variance_clipped),
        post_c1=t2n(g.posterior_mean_coef1),
        post_c2=t2n(g.posterior_mean_coef2),
        t=t.numpy(),
        x=t2n(x),
        noise=t2n(noise),
        q_samp=t2n(q_samp),
        pred_x0=t2n(pred_x0),
        post_mean=t2n(post_mean),
        post_var=t2n(post_var),
        post_logvar=t2n(post_logvar),
        rots=rots,
        rots_noise=rots_noise,
        noise_vec=t2n(nv),
        so3_q_samp=t2n(so3_q_samp),
        so3_pred_x0=t2n(so3_pred_x0),
        so3_post_mean=t2n(so3_post_mean),
        shift=t2n(shift),
        shift_n=t2n(shift_n),
        se3_q_rot=t2n(se3_q.rot),
        se3_q_shift=t2n(se3_q.shift),
        se3_pred_rot=t2n(se3_pred.rot),
        se3_pred_shift=t2n(se3_pred.shift),
    )
    print("processes.npz written")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    make_so3_goldens()
    make_igso3_goldens()
    make_process_goldens()
