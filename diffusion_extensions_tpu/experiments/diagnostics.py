"""Diagnostics & figure generation — the reference's standalone analysis
scripts as one CLI:

    python -m diffusion_extensions_tpu.experiments.diagnostics sphere-probs
    python -m diffusion_extensions_tpu.experiments.diagnostics interp
    python -m diffusion_extensions_tpu.experiments.diagnostics se3-path
    python -m diffusion_extensions_tpu.experiments.diagnostics bingham-render
    python -m diffusion_extensions_tpu.experiments.diagnostics aircraft-diags
    python -m diffusion_extensions_tpu.experiments.diagnostics prot-diags
    python -m diffusion_extensions_tpu.experiments.diagnostics pdb-path

Reference equivalents: ``sphere_probs.py``, ``so3_interp_test.py``,
``se3_path_gen.py`` (its ``rot_scale`` AttributeError fixed),
``bingham_render.py``, ``aircraft_diags.py``, ``prot_diags.py``,
``pdb_path_gen.py`` + ``pymol_render.py`` (emits transformed-PDB frames and
a PyMOL .pml render script).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def sphere_probs(args):
    from ..viz.sphere import plot_igso3_density_spheres

    out = os.path.join(args.out_dir, "sphere_probs.png")
    os.makedirs(args.out_dir, exist_ok=True)
    plot_igso3_density_spheres(np.logspace(-2, 0.5, 6), out_path=out)
    print(f"wrote {out}")


def interp(args):
    """Euler traces of the geodesic lock segment (``so3_interp_test.py``)."""
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.synthetic import lock_segment_endpoints
    from ..ops.so3 import rmat_to_euler, so3_lerp
    from ..viz.colors import BLUE, GREEN, ORANGE
    from ..viz.mpl import setup_pi_axis
    from ..viz.sphere import plot_rotation_frames

    r1, r2 = lock_segment_endpoints()
    weights = jnp.linspace(0, 1, 1000)[:, None]
    path = so3_lerp(r1, r2, weights)
    x, y, z = rmat_to_euler(path)
    fig, axlist = plt.subplots(nrows=3, ncols=1, sharex=True)
    for ax, series, c in zip(axlist, (x, y, z), (BLUE, ORANGE, GREEN)):
        ax.plot(np.asarray(series), c=c)
        setup_pi_axis(ax)
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "interp_euler_traces.png")
    fig.savefig(out, dpi=150)
    plt.close(fig)
    plot_rotation_frames(
        np.asarray(path[::20]),
        out_path=os.path.join(args.out_dir, "interp_sphere.png"),
    )
    print(f"wrote {out} and interp_sphere.png")


def se3_path(args):
    """Forward-only SE(3) noising path (``se3_path_gen.py``; the reference
    crashes on the undefined ``rot_scale`` attribute — fixed here by using
    the process's actual ``shift_scale``)."""
    import jax
    import jax.numpy as jnp

    from ..ops.igso3 import IGSO3xR3
    from ..ops.se3 import AffineT, se3_scale
    from ..processes.se3 import SE3Diffusion

    process = SE3Diffusion.create(timesteps=args.steps)
    x = AffineT.identity((args.samples,))
    key = jax.random.PRNGKey(0)
    rots, shifts = [], []
    for i in range(args.steps):
        rots.append(np.asarray(x.rot))
        shifts.append(np.asarray(x.shift))
        beta_t = process.schedule.betas[i]
        mean = se3_scale(x, jnp.sqrt(1.0 - beta_t)[None].repeat(args.samples))
        dist = IGSO3xR3.create(
            jnp.full((args.samples,), beta_t),
            mean=mean,
            shift_scale=process.shift_scale,
        )
        x = dist.sample(jax.random.fold_in(key, i))
    rots.append(np.asarray(x.rot))
    shifts.append(np.asarray(x.shift))
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "se3_paths.npz")
    np.savez(out, rots=np.stack(rots), shifts=np.stack(shifts))
    print(f"wrote {out}: {len(rots)} steps x {args.samples} samples")


def bingham_render(args):
    """Sphere scatter of the four Bingham presets
    (``bingham_render.py``)."""
    import jax

    from ..data.synthetic import BINGHAM_COVS, bingham_dist
    from ..ops.so3 import quat_to_rmat
    from ..viz.sphere import plot_rotation_frames

    os.makedirs(args.out_dir, exist_ok=True)
    for acro in sorted(BINGHAM_COVS):
        quats = bingham_dist(acro).sample(jax.random.PRNGKey(0), (1024,))
        rots = quat_to_rmat(quats)
        out = os.path.join(args.out_dir, f"{acro}.png")
        plot_rotation_frames(np.asarray(rots), out_path=out, title=acro)
        print(f"wrote {out}")


def _percentile_table(name, values, pcts=(1, 5, 10, 50, 90, 95, 99)):
    vals = np.sort(np.ravel(values))
    idxs = [int(len(vals) * p / 100) for p in pcts]
    print("percentiles " + " ".join(f"& {p}%" for p in pcts) + r" \\")
    print(name + " " + " ".join(f"& {vals[i]:.2f}" for i in idxs) + r" \\")
    return vals


def aircraft_diags(args):
    """Compare euler vs so3 angle-error result files
    (``aircraft_diags.py``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    for diff_type in ("eul", "so3"):
        path = os.path.join(args.results_dir, f"results_aircraft_{diff_type}.npy")
        if not os.path.exists(path):
            print(f"missing {path}, skipping")
            continue
        vals = _percentile_table(diff_type, np.load(path))
        ax.plot(vals, label={"eul": "euler", "so3": "so3"}[diff_type])
    ax.legend()
    ax.set_ylabel("angle error (rad)")
    ax.set_xlabel("sorted sample index")
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "aircraft_diags.png")
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


def prot_diags(args):
    """Compare se3 vs euler docking samples (``prot_diags.py``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    figs = {}
    for metric in ("angles", "shifts"):
        figs[metric] = plt.subplots()
    for diff_type in ("eul", "se3"):
        path = os.path.join(args.results_dir, f"prot_samples_{diff_type}.json")
        if not os.path.exists(path):
            print(f"missing {path}, skipping")
            continue
        data = json.load(open(path))
        for metric in ("angles", "shifts"):
            vals = _percentile_table(
                f"{diff_type}-{metric}", np.asarray(data[metric])
            )
            figs[metric][1].plot(vals, label=diff_type)
    os.makedirs(args.out_dir, exist_ok=True)
    for metric, (fig, ax) in figs.items():
        ax.legend()
        ax.set_xlabel("sorted sample index")
        ax.set_ylabel(metric)
        out = os.path.join(args.out_dir, f"prot_diags_{metric}.png")
        fig.savefig(out, dpi=150)
        print(f"wrote {out}")


def pdb_path(args):
    """Write a noised ligand PDB trajectory + PyMOL render script
    (``pdb_path_gen.py`` + ``pymol_render.py``)."""
    from ..data.pdb import ProtPairDataset, transform_pdb

    paths = np.load(args.se3_paths)
    rots, shifts = paths["rots"], paths["shifts"]  # (S+1, N, 3, 3), (S+1, N, 3)
    ds = ProtPairDataset(args.data_root)
    os.makedirs(args.out_dir, exist_ok=True)
    n = min(len(ds.prots), rots.shape[1])
    stride = max(1, rots.shape[0] // args.frames)
    for i in range(n):
        prot = ds.prots[i]
        rec = ds.basepath / f"{prot}_receptors.pdb"
        lig = ds.basepath / f"{prot}_ligand.pdb"
        import shutil

        shutil.copy2(rec, os.path.join(args.out_dir, f"{prot}_receptors.pdb"))
        for step in range(0, rots.shape[0], stride):
            out = os.path.join(args.out_dir, f"{prot}_ligand_{step:04d}.pdb")
            transform_pdb(lig, out, rots[step, i], shifts[step, i] * 40.0)
        print(f"wrote trajectory for {prot}")
    # PyMOL batch render script (pymol_render.py equivalent)
    pml = os.path.join(args.out_dir, "render_path.pml")
    with open(pml, "w") as f:
        f.write(
            "# PyMOL batch render of the noised docking trajectories\n"
            "# usage: pymol -cq render_path.pml\n"
            "python\n"
            "from glob import glob\n"
            "import os\n"
            "from pymol import cmd\n"
            f"base = {args.out_dir!r}\n"
            "for rec in sorted(glob(os.path.join(base, '*_receptors.pdb'))):\n"
            "    prefix = os.path.basename(rec)[:4]\n"
            "    cmd.delete('all'); cmd.load(rec); cmd.color('gray70')\n"
            "    for lig in sorted(glob(os.path.join(base, prefix + '_ligand_*.pdb'))):\n"
            "        name = os.path.splitext(os.path.basename(lig))[0]\n"
            "        cmd.load(lig); cmd.color('tv_red', name)\n"
            "        cmd.ray(1600, 1200)\n"
            "        cmd.png(os.path.join(base, name + '.png'))\n"
            "        cmd.delete(name)\n"
            "python end\n"
        )
    print(f"wrote {pml}")


def main(argv=None):
    p = argparse.ArgumentParser(description="Diagnostics & figure generation")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in (
        "sphere-probs", "interp", "se3-path", "bingham-render",
        "aircraft-diags", "prot-diags", "pdb-path",
    ):
        sp = sub.add_parser(name)
        sp.add_argument("--out-dir", dest="out_dir", default="images")
        if name == "se3-path":
            sp.add_argument("--samples", type=int, default=14)
            sp.add_argument("--steps", type=int, default=1000)
        if name in ("aircraft-diags", "prot-diags"):
            sp.add_argument("--results-dir", dest="results_dir", default="weights")
        if name == "pdb-path":
            sp.add_argument("--se3-paths", dest="se3_paths",
                            default="images/se3_paths.npz")
            sp.add_argument("--data-root", dest="data_root",
                            default="data/BPTI_dock")
            sp.add_argument("--frames", type=int, default=100)
    args = p.parse_args(argv)
    {
        "sphere-probs": sphere_probs,
        "interp": interp,
        "se3-path": se3_path,
        "bingham-render": bingham_render,
        "aircraft-diags": aircraft_diags,
        "prot-diags": prot_diags,
        "pdb-path": pdb_path,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
