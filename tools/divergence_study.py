"""Summarize the 1M-step divergence study arms (round 4).

Round-4 part 1 ran the flagship aircraft so3 workload at the reference's
full budget (1M steps, constant Adam 1e-4 — ``aircraft_rotate.py:16-18,
102``) and found the protocol itself degrades: train loss and the frozen
validation probe rise monotonically from ~120k steps, and the 1M
checkpoint samples near the Haar prior (p50 1.68 rad vs 0.06 at 200k).

``scripts/round4_queue3.sh`` trains four 150k arms differing in one
factor each (ctl=bf16 reproduction / f32 / clip 1.0 / lr 3e-5), all with
``--log-norms``.  This tool turns their JSONL logs into the comparison
table + spike statistics for BENCHMARKS.md.

Usage: python tools/divergence_study.py [results/div_*_train.jsonl ...]
"""
from __future__ import annotations

import glob
import json
import sys


def load(path):
    rows = [json.loads(l) for l in open(path)]
    return [r for r in rows if "loss" in r]


def window_mean(rows, key, lo, hi):
    vals = [r[key] for r in rows if lo <= r["step"] < hi and key in r]
    return sum(vals) / len(vals) if vals else float("nan")


def summarize(path):
    rows = load(path)
    if not rows:
        return None
    name = path.split("/")[-1].replace("_train.jsonl", "")
    last = rows[-1]["step"]
    early = window_mean(rows, "loss", 30_000, 60_000)
    late = window_mean(rows, "loss", last - 30_000, last + 1)
    gnorms = [r["grad_norm"] for r in rows if "grad_norm" in r]
    spikes = 0
    if gnorms:
        med = sorted(gnorms)[len(gnorms) // 2]
        spikes = sum(g > 3 * med for g in gnorms)
    return {
        "arm": name,
        "steps": last,
        "loss_30k_60k": round(early, 3),
        "loss_last30k": round(late, 3),
        "degradation_x": round(late / early, 2) if early == early else None,
        "grad_norm_med": round(sorted(gnorms)[len(gnorms) // 2], 2)
        if gnorms else None,
        "grad_spikes_gt3xmed": spikes,
        "param_norm_last": round(rows[-1].get("param_norm", float("nan")), 1),
        "test_loss_last": round(
            window_mean(rows, "test_loss", last - 30_000, last + 1), 3
        ),
    }


def main(paths):
    if not paths:
        paths = sorted(glob.glob("results/div_*_train.jsonl"))
    out = [s for p in paths if (s := summarize(p))]
    for s in out:
        print(json.dumps(s))
    if out:
        # markdown table for BENCHMARKS.md
        keys = list(out[0].keys())
        print("\n| " + " | ".join(keys) + " |")
        print("|" + "---|" * len(keys))
        for s in out:
            print("| " + " | ".join(str(s[k]) for k in keys) + " |")


if __name__ == "__main__":
    main(sys.argv[1:])
