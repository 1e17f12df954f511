"""Grid hyperparameter sweep runner (zero-egress replacement for the
reference's wandb sweep, ``slurm-scripts/sweep.yaml`` + ``ncc_sweep.sh``).

Runs every combination of a JSON parameter grid through an experiment
module sequentially, giving each run its own checkpoint/log directory, and
summarises the last logged metrics.

Usage:
    python tools/sweep.py aircraft --steps 2000 \
        --grid '{"lr": [1e-4, 3e-4], "dim": [256, 512]}' --out sweeps/air
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("module", help="experiment module name (e.g. aircraft)")
    p.add_argument("--grid", required=True, help="JSON dict of param lists")
    p.add_argument("--out", default="sweeps/run")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("rest", nargs="*", help="extra flags passed to every run")
    args = p.parse_args(argv)

    grid = json.loads(args.grid)
    keys = sorted(grid)
    combos = list(itertools.product(*(grid[k] for k in keys)))
    print(f"{len(combos)} runs over {keys}")
    results = []
    for combo in combos:
        tag = "_".join(f"{k}{v}" for k, v in zip(keys, combo))
        run_dir = os.path.join(args.out, tag)
        os.makedirs(run_dir, exist_ok=True)
        cmd = [
            sys.executable, "-u", "-m",
            f"diffusion_extensions_tpu.experiments.{args.module}",
        ]
        for k, v in zip(keys, combo):
            cmd += [f"--{k}", str(v)]
        if args.steps is not None:
            cmd += ["--steps", str(args.steps)]
        log_path = os.path.join(run_dir, "metrics.jsonl")
        cmd += ["--ckpt", os.path.join(run_dir, "ckpt"), "--log", log_path]
        cmd += args.rest
        print(">>", " ".join(cmd), flush=True)
        subprocess.run(cmd, cwd=REPO, check=True)
        last = None
        if os.path.exists(log_path):
            with open(log_path) as f:
                for line in f:
                    last = json.loads(line)
        results.append({"params": dict(zip(keys, combo)), "final": last})
        print(json.dumps(results[-1]))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"summary -> {os.path.join(args.out, 'summary.json')}")


if __name__ == "__main__":
    main()
