"""Figure: the reference's 1M-step aircraft budget, faithful vs stabilized.

Reads the two committed full-budget training JSONLs and writes
``images/aircraft_1m_budget.png``:

* left panel — train loss vs step for the faithful protocol (constant
  Adam 1e-4, no clip — ``aircraft_rotate.py:16-18,103``) and the
  minimal-stabilizer rerun (``--clip 1.0``, same everything else).
* right panel — the frozen validation probe (fixed held-out batch,
  evaluated during training) for both arms, with the stabilized arm's
  probe minimum marked.

The claim the figure carries (BENCHMARKS.md "FULL 1M-step aircraft
budget"): the faithful protocol degrades monotonically long before 1M;
clip 1.0 prevents the collapse-to-prior but the best model still lives
at 100-200k — the budget exceeds the task's capacity either way.

Usage: python tools/budget_figure.py
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from diffusion_extensions_tpu.viz.colors import BLUE, GREY, ORANGE  # noqa: E402


def rows(path):
    return [json.loads(l) for l in open(path)]


def series(rs, key):
    xs = np.array([r["step"] for r in rs if key in r], dtype=float)
    ys = np.array([r[key] for r in rs if key in r], dtype=float)
    return xs / 1e6, ys


def main():
    faithful = rows("results/aircraft_so3_train_r3.jsonl")
    clipped = rows("results/aircraft_so3_1m_fix_train.jsonl")

    fig, axes = plt.subplots(1, 2, figsize=(10, 3.6), sharex=True)
    panels = (
        ("loss", "train loss"),
        ("test_loss", "frozen-probe loss"),
    )
    def smooth(y, w=9):
        if len(y) < w:
            return y
        k = np.ones(w) / w
        pad = np.concatenate([np.repeat(y[0], w // 2), y,
                              np.repeat(y[-1], w // 2)])
        return np.convolve(pad, k, mode="valid")

    for ax, (key, title) in zip(axes, panels):
        xf, yf = series(faithful, key)
        xc, yc = series(clipped, key)
        ax.plot(xf, yf, color=BLUE, lw=0.8, alpha=0.25)
        ax.plot(xc, yc, color=ORANGE, lw=0.8, alpha=0.25)
        ax.plot(xf, smooth(yf), color=BLUE, lw=1.8,
                label="faithful (const Adam 1e-4, no clip)")
        ax.plot(xc, smooth(yc), color=ORANGE, lw=1.8,
                label="+ global-norm clip 1.0")
        ax.set_title(title, fontsize=11)
        ax.set_xlabel("step (millions)")
        ax.grid(True, color=GREY, alpha=0.25, lw=0.5)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        ax.set_ylim(0, None)

    # mark the stabilized arm's probe minimum (the model the published
    # workflow's implicit checkpoint selection would keep)
    xc, yc = series(clipped, "test_loss")
    i = int(np.argmin(yc))
    axes[1].scatter([xc[i]], [yc[i]], s=28, color=ORANGE, zorder=5)
    axes[1].annotate(
        f"probe min @ {xc[i]*1e3:.0f}k ({yc[i]:.3f})",
        (xc[i], yc[i]), xytext=(0.30, 0.72), textcoords="data",
        fontsize=9, color="#52514e",
        arrowprops=dict(arrowstyle="->", color="#52514e", lw=0.8),
    )
    axes[0].legend(loc="upper left", fontsize=9, frameon=False)
    fig.suptitle(
        "Reference 1M-step aircraft budget: both arms degrade past ~200k",
        fontsize=12,
    )
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    out = "images/aircraft_1m_budget.png"
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
