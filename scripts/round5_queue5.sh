#!/bin/bash
# Round-5 TPU queue, part 5 — full-protocol production-config protein arm.
#
# The bf16 opt-state recommendation rests on a 50k probe; this arm runs
# the COMPLETE canonical docking protocol (two phases: 0->120k at lr
# 3e-4, then the 120k->240k lr-1e-4 polish — the exact seed-0 recipe of
# scripts/round3_queue7.sh:47-61) under the production optimizer config
# (K=8 dispatch fusion + --opt-impl fused --opt-state-dtype bf16), then
# the two production evals.  Lands a third canonical-matrix row:
# "seed 0, production opt config".
set -x
cd "$(dirname "$0")/.."
WD=scripts/watchdog.sh
RW=scripts/relay_wait.sh

# wait for queue 4 (both wrapper and child pids) to release the chip
for p in $(cat /tmp/q5r5d.pid 2>/dev/null); do
  while kill -0 "$p" 2>/dev/null; do sleep 60; done
done
bash "$RW"

run_training() {  # progress-file stall-minutes cmd...
  local prog=$1 stallm=$2; shift 2
  for i in 1 2 3; do
    "$WD" $((stallm * 60)) "$prog" -- "$@" --resume && return 0
    bash "$RW"
  done
  return 1
}

PROD="--opt-impl fused --opt-state-dtype bf16 --steps-per-call 8"
ARCH="--se3 --seed 0 --batch 16 --frame-pool --cross-depth 2 --rel-frame --equiv-head --bf16"

# ---- A) phase 1: 0 -> 120k at lr 3e-4 ------------------------------------
run_training results/protein_prodopt_s0_train.jsonl 15 \
  python -u -m diffusion_extensions_tpu.experiments.protein $ARCH $PROD \
  --lr 3e-4 --steps 120000 \
  --ckpt weights/protein_prodopt_s0 --ckpt-every 20000 \
  --log results/protein_prodopt_s0_train.jsonl --print-every 500
echo "QUEUE R5-5 PRODOPT PHASE1 DONE"

# ---- B) phase 2: 120k -> 240k lr-decay polish at lr 1e-4 ------------------
run_training results/protein_prodopt_s0_train.jsonl 15 \
  python -u -m diffusion_extensions_tpu.experiments.protein $ARCH $PROD \
  --lr 1e-4 --steps 240000 \
  --ckpt weights/protein_prodopt_s0 --ckpt-every 20000 \
  --log results/protein_prodopt_s0_train.jsonl --print-every 500
echo "QUEUE R5-5 PRODOPT 240K DONE"

# ---- C) canonical evals (production chain + ancestral reference) ----------
for ev in "ddim:--sampler ddim --sampler-steps 50" "ancestral:"; do
  name=${ev%%:*}; flags=${ev#*:}
  "$WD" 1800 "results/protein_prodopt_s0_eval_${name}.log" -- bash -c \
    "python -u -m diffusion_extensions_tpu.experiments.protein $ARCH \
      --test $flags --ckpt weights/protein_prodopt_s0 \
      2>&1 | tee results/protein_prodopt_s0_eval_${name}.log" \
    || bash "$RW"
done
echo "QUEUE R5-5 COMPLETE"
