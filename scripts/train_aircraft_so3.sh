#!/bin/bash
# Launcher for the aircraft experiment (replaces slurm-scripts/ — single-host,
# one process per host; multi-chip parallelism is in-process via the mesh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 "$@"
