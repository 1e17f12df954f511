"""Render the per-checkpoint Bingham MMD-vs-step curve figure
(reference protocol: ``bingham_test.py:34-47`` evaluates MMD across the
checkpoint series; here the curve is recorded online during training).

Usage: python tools/plot_bingham_curve.py [out_png]
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, ".")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from diffusion_extensions_tpu.viz.colors import BLUE, GREEN, GREY, ORANGE

COLORS = {"sur": BLUE, "scr": ORANGE, "lcr": GREEN, "lur": "#d62728"}
ACCEPT = (2.0 / 20_000) ** 0.5 * (1 + (2 * __import__("math").log(20)) ** 0.5)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "images/bingham_mmd_curve.png"
    fig, ax = plt.subplots(figsize=(6, 4))
    for path in sorted(glob.glob("results/bingham_mmd_curve_*.json")):
        cov = os.path.basename(path)[len("bingham_mmd_curve_"):-len(".json")]
        with open(path) as f:
            curve = json.load(f)
        steps = [c["step"] for c in curve]
        mmds = [c["mmd"] for c in curve]
        ax.plot(steps, mmds, "o-", ms=3.5, lw=1.2,
                color=COLORS.get(cov, GREY), label=cov)
    ax.axhline(ACCEPT, color=GREY, ls="--", lw=1,
               label=f"accept threshold ({ACCEPT:.4f})")
    ax.set_yscale("log")
    ax.set_xlabel("training step")
    ax.set_ylabel("MMD(model, target), 20k samples")
    ax.set_title("Bingham density matching: MMD vs checkpoint")
    ax.legend(frameon=False, fontsize=9)
    ax.spines[["top", "right"]].set_visible(False)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
