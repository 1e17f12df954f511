"""Figure: MoE expert utilization + loss parity vs dense control (round 4).

Reads the committed training JSONLs and writes
``images/moe_expert_utilization.png``:

* top panel — the across-(layer, expert) min/median/max band of the
  per-layer expert fractions over training, against the 1/E uniform
  share.  The claim the figure carries: utilization stays in a healthy
  band around uniform, the floor never pins to zero (no dead experts),
  no collapse onto one expert.
* bottom panel — frozen-probe loss, MoE-4 vs the dense control at the
  same budget/seed (quality parity at matched per-token FLOPs).

Usage: python tools/moe_figure.py
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


def main():
    moe = rows("results/aircraft_moe4_train.jsonl")
    den = rows("results/aircraft_dense_ctl_train.jsonl")

    steps = np.array([r["step"] for r in moe if "expert_fracs" in r])
    fr = np.array([r["expert_fracs"] for r in moe if "expert_fracs" in r])
    fr = fr.reshape(len(fr), -1)  # (T, layers*experts)
    n_e = len(moe[0]["expert_fracs"][0])

    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(7.2, 5.4), sharex=True,
        gridspec_kw={"hspace": 0.28},
    )
    for ax in (ax1, ax2):
        ax.grid(True, color="#e6e6e6", linewidth=0.6, zorder=0)
        ax.set_axisbelow(True)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)

    ax1.fill_between(
        steps, fr.min(axis=1), fr.max(axis=1), color=GREY, alpha=0.25,
        linewidth=0, zorder=1, label="min-max over layers x experts",
    )
    ax1.plot(steps, np.median(fr, axis=1), color=BLUE, linewidth=2,
             zorder=3, label="median expert fraction")
    ax1.axhline(1.0 / n_e, color="#555555", linewidth=1.2, linestyle="--",
                zorder=2)
    ax1.text(steps[-1], 1.0 / n_e + 0.012, f"uniform share 1/{n_e}",
             ha="right", va="bottom", fontsize=8.5, color="#555555")
    ax1.set_ylim(0, min(1.0, fr.max() * 1.15))
    ax1.set_ylabel("expert fraction")
    ax1.set_title(
        "Switch-MoE (4 experts) expert utilization over 50k aircraft steps",
        fontsize=10.5, loc="left",
    )
    ax1.legend(loc="upper right", fontsize=8.5, frameon=False)

    def probe(rs):
        s = np.array([r["step"] for r in rs if "test_loss" in r])
        v = np.array([r["test_loss"] for r in rs if "test_loss" in r])
        return s, v

    for rs, c, lab in ((moe, BLUE, "MoE-4 (scatter dispatch)"),
                       (den, ORANGE, "dense control")):
        s, v = probe(rs)
        # light smoothing for readability; raw points stay visible
        ax2.plot(s, v, color=c, linewidth=0.8, alpha=0.3, zorder=2)
        k = 9
        sm = np.convolve(v, np.ones(k) / k, mode="valid")
        ax2.plot(s[k // 2: k // 2 + len(sm)], sm, color=c, linewidth=2,
                 zorder=3, label=lab)
    ax2.set_yscale("log")
    ax2.set_xlabel("training step")
    ax2.set_ylabel("frozen-probe loss")
    ax2.set_title("Quality parity with the dense control (same budget/seed)",
                  fontsize=10.5, loc="left")
    ax2.legend(loc="upper right", fontsize=8.5, frameon=False)

    fig.savefig("images/moe_expert_utilization.png", dpi=150,
                bbox_inches="tight")
    print("wrote images/moe_expert_utilization.png")


if __name__ == "__main__":
    main()
