#!/bin/bash
# Round-5 TPU queue, part 2 — the bf16-opt-state QUALITY check at depth
# (VERDICT r4 item 4's "50k-step quality-parity check: probe loss +
# docking percentiles unchanged"; the 5k loss-parity runs are
# results/protein_optstate_{f32,bf16}_train.jsonl).
#
# Two matched 50k arms of the headline equiv-head protein config
# (seed 0, batch 16, lr 3e-4, K=8 dispatch for speed — K-fusion is
# bit-parity-tested vs sequential in tests/test_train.py), differing
# ONLY in the optimizer state dtype:
#   arm A: production default        (optax Adam, f32 moments)
#   arm B: recommended large-model   (--opt-impl fused --opt-state-dtype bf16)
# then a DDIM-50 docking eval on each 50k checkpoint.
set -x
cd "$(dirname "$0")/.."
WD=scripts/watchdog.sh
RW=scripts/relay_wait.sh

run_once () {  # run_once <stall_s> <progress_file> cmd...
  local stall=$1 prog=$2; shift 2
  for i in 1 2 3; do
    "$WD" "$stall" "$prog" -- "$@" && return 0
    rc=$?
    if [ "$rc" -ne 42 ]; then return "$rc"; fi
    "$RW" || return 1
  done
  return 42
}

for arm in "q50_f32:" "q50_bf16:--opt-impl fused --opt-state-dtype bf16"; do
  name=${arm%%:*}; flags=${arm#*:}
  run_once 900 "results/protein_${name}_train.jsonl" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
      --seed 0 --batch 16 --lr 3e-4 --steps-per-call 8 --frame-pool \
      --cross-depth 2 --rel-frame --equiv-head --bf16 --steps 50000 $flags \
      --ckpt weights/protein_${name} --ckpt-every 25000 \
      --log results/protein_${name}_train.jsonl --print-every 500"
  run_once 1500 "results/protein_${name}_eval_ddim.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
      --seed 0 --batch 16 --frame-pool --cross-depth 2 --rel-frame \
      --equiv-head --bf16 --test --sampler ddim --sampler-steps 50 \
      --ckpt weights/protein_${name} \
      2>&1 | tee results/protein_${name}_eval_ddim.log"
done
echo "QUEUE R5-2 COMPLETE"
