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

    np.savez(
        os.path.join(OUT, "igso3.npz"),
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


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    make_so3_goldens()
    make_igso3_goldens()
