#!/bin/bash
# Round-3 TPU queue, part 7 — rebuild the equiv-head arm lost to the
# machine restart (the VM wiped the gitignored weights/ tree mid-queue3,
# killing the 240k polish run at step 133k) and finish what queue3+6 set
# out to prove: does the lr-1e-4 polish phase plus a deterministic chain
# (DDIM-50 / exact-flow PF-50 — no sigma_t*75 posterior noise injected
# over the last timesteps) bring the augmented-protocol shift endpoint
# p50 under 5?
#
# Phase 1: retrain 0 -> 120k at lr 3e-4 (same recipe as the committed
#          120k row: rot p50 0.36 / shift p50 6.97).
# Phase 2: polish 120k -> 240k at lr 1e-4 (queue3's plan).
# Phase 3: eval the 240k checkpoint with ancestral / ddim50 / pf50 under
#          the faithful augmented protocol + the per-block probe.
set -x
cd "$(dirname "$0")/.."
WD=scripts/watchdog.sh
RW=scripts/relay_wait.sh

run_training () {  # run_training <progress_file> <max_tries> cmd...
  local prog=$1 tries=$2; shift 2
  for i in $(seq 1 "$tries"); do
    "$WD" 600 "$prog" -- "$@" && return 0
    rc=$?
    if [ "$rc" -ne 42 ]; then return "$rc"; fi
    echo "stall #$i; waiting for relay, then resuming" >&2
    "$RW" || return 1
    case " $* " in *" --resume "*) ;; *) set -- "$@" --resume ;; esac
  done
  return 42
}

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

bash "$RW"

# 1) phase 1: 0 -> 120k at lr 3e-4
run_training results/protein_se3_equiv_train.jsonl 10 \
  python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
  --batch 16 --lr 3e-4 --frame-pool --cross-depth 2 --rel-frame \
  --equiv-head --bf16 --steps 120000 --ckpt weights/protein_se3_equiv \
  --ckpt-every 20000 --log results/protein_se3_equiv_train.jsonl \
  --print-every 500

# 2) phase 2: polish 120k -> 240k at lr 1e-4
run_training results/protein_se3_equiv_train.jsonl 10 \
  python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
  --batch 16 --lr 1e-4 --frame-pool --cross-depth 2 --rel-frame \
  --equiv-head --bf16 --steps 240000 --ckpt weights/protein_se3_equiv \
  --ckpt-every 20000 --log results/protein_se3_equiv_train.jsonl \
  --print-every 500 --resume

# 3) evals: ancestral + ddim50 + pf50 on the same 240k checkpoint
run_once 1500 results/prot_se3_equiv_eval240.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
    --batch 16 --frame-pool --cross-depth 2 --rel-frame --equiv-head --bf16 \
    --test --ckpt weights/protein_se3_equiv \
    2>&1 | tee results/prot_se3_equiv_eval240.log"
for smp in ddim pf; do
  run_once 1500 "results/prot_se3_equiv_eval240_${smp}50.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
      --batch 16 --frame-pool --cross-depth 2 --rel-frame --equiv-head --bf16 \
      --test --sampler $smp --sampler-steps 50 \
      --ckpt weights/protein_se3_equiv \
      2>&1 | tee results/prot_se3_equiv_eval240_${smp}50.log"
done
run_once 1500 results/prot_se3_equiv_probe240.log \
  bash -c "python -u -m tools.probe_protein --ckpt weights/protein_se3_equiv \
    --frame-pool --cross-depth 2 --rel-frame --equiv-head --augment \
    2>&1 | tee results/prot_se3_equiv_probe240.log"

echo "QUEUE7 COMPLETE"
