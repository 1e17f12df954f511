#!/bin/bash
# Round-2 serial TPU queue: the axon relay serializes one process at a
# time, so long-running training jobs are chained here back-to-back.
# Protein SE(3) runs first (the round-1 quality gap); aircraft retrains on
# the de-symmetrized data follow; full bench last.
set -x
cd "$(dirname "$0")/.."

# 1) protein docking, SE(3) (clip-shift sampler default, grad-norm logging)
python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
  --steps 120000 --ckpt weights/protein_se3_r2 --ckpt-every 20000 \
  --log results/protein_se3_train.jsonl --print-every 500
python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
  --test --ckpt weights/protein_se3_r2

# 2) aircraft flagship comparison on the de-symmetrized synthetic data
python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --steps-per-call 8 --steps 200000 --ckpt weights/aircraft_so3_r2 \
  --log results/aircraft_so3_train.jsonl --print-every 1000 --ckpt-every 20000
python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --test --ckpt weights/aircraft_so3_r2
python -u -m diffusion_extensions_tpu.experiments.aircraft --bf16 \
  --steps-per-call 8 --steps 200000 --ckpt weights/aircraft_eul_r2 \
  --log results/aircraft_eul_train.jsonl --print-every 1000 --ckpt-every 20000
python -u -m diffusion_extensions_tpu.experiments.aircraft --bf16 \
  --test --ckpt weights/aircraft_eul_r2

# 3) protein euler baseline
python -u -m diffusion_extensions_tpu.experiments.protein \
  --steps 120000 --ckpt weights/protein_eul_r2 --ckpt-every 20000 \
  --log results/protein_eul_train.jsonl --print-every 500
python -u -m diffusion_extensions_tpu.experiments.protein \
  --test --ckpt weights/protein_eul_r2

# 4) final full bench
python -u bench.py
