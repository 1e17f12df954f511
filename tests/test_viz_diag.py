"""Smoke tests for viz and diagnostics (headless matplotlib)."""
import os

import numpy as np
import jax
import pytest


def test_multiple_formatter():
    from diffusion_extensions_tpu.viz.mpl import multiple_formatter

    f = multiple_formatter(denominator=2)
    assert f(0.0, None) == r"$0$"
    assert f(np.pi, None) == r"$\pi$"
    assert f(-np.pi, None) == r"$-\pi$"
    assert f(np.pi / 2, None) == r"$\frac{\pi}{2}$"
    assert f(3 * np.pi / 2, None) == r"$\frac{3\pi}{2}$"


def test_colors():
    from diffusion_extensions_tpu.viz import BLUE_F, GREY_F

    assert len(BLUE_F) == 3
    np.testing.assert_allclose(BLUE_F, (0x1F / 255, 0x77 / 255, 0xB4 / 255))
    np.testing.assert_allclose(GREY_F, (0x88 / 255,) * 3)


def test_sphere_figures(tmp_path):
    from diffusion_extensions_tpu.ops.so3 import exp_skewvec
    from diffusion_extensions_tpu.viz.sphere import (
        plot_igso3_density_spheres,
        plot_rotation_frames,
    )

    rots = exp_skewvec(jax.random.normal(jax.random.PRNGKey(0), (64, 3)))
    out1 = os.path.join(str(tmp_path), "frames.png")
    plot_rotation_frames(np.asarray(rots), out_path=out1)
    assert os.path.getsize(out1) > 1000
    out2 = os.path.join(str(tmp_path), "dens.png")
    plot_igso3_density_spheres([0.1, 1.0], out_path=out2, count=31)
    assert os.path.getsize(out2) > 1000


def test_diagnostics_cli(tmp_path):
    from diffusion_extensions_tpu.experiments import diagnostics

    out = str(tmp_path)
    diagnostics.main(["interp", "--out-dir", out])
    assert os.path.exists(os.path.join(out, "interp_euler_traces.png"))
    diagnostics.main(
        ["se3-path", "--out-dir", out, "--samples", "3", "--steps", "8"]
    )
    paths = np.load(os.path.join(out, "se3_paths.npz"))
    assert paths["rots"].shape == (9, 3, 3, 3)
    assert paths["shifts"].shape == (9, 3, 3)
    assert np.isfinite(paths["shifts"]).all()


def test_pdb_path_roundtrip(tmp_path):
    """transform_pdb rewrites coordinates and preserves other columns."""
    from diffusion_extensions_tpu.data.pdb import transform_pdb

    src = os.path.join(str(tmp_path), "in.pdb")
    line = (
        "ATOM      2  CA  ALA A   1      11.639   6.071  -5.147"
        "  1.00  0.00           C\n"
    )
    with open(src, "w") as f:
        f.write(line)
        f.write("TER\n")
    dst = os.path.join(str(tmp_path), "out.pdb")
    rot = np.eye(3)
    transform_pdb(src, dst, rot, np.array([1.0, -2.0, 3.0]))
    out = open(dst).read().splitlines()
    assert out[1] == "TER"
    assert "12.639" in out[0] and "4.071" in out[0] and "-2.147" in out[0]
    assert out[0][:30] == line[:30]
    assert out[0][54:] == line.rstrip("\n")[54:]


def test_grad_check_fast():
    from diffusion_extensions_tpu.experiments import grad_check

    grad_check.main(["--iters", "800", "--lr", "0.05"])
