#!/bin/bash
# Round-3 TPU queue, part 3 — close the last augmented-protocol gap
# (shift p50 < 5).  The equiv-head arm at 120k/lr3e-4 reached rot p50
# 0.36 (target met) / shift p50 6.97 (target <5): per-step shift MSE is
# already excellent (probe: 0.02-0.28 vs zero ~1.0), so the lever is a
# longer, lower-lr polish phase, not an architecture change.  Resume the
# same checkpoint at lr 1e-4 to 240k, then re-eval + probe.
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
    set -- "$@" --resume
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

# 0) PF-sampler grid fix evidence (cheap, runs first): the uniform grid
#    fails the concentrated Bingham presets; re-run the trained-model
#    sampler A/B with both grids side by side, plus the toy PF re-run
#    (karras is now the default grid)
for cov in sur scr lcr lur; do
  run_once 900 "results/bingham_${cov}_sampler_ab.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.bingham $cov \
      --test --sampler-ab --ckpt weights/bingham_${cov}_r3 \
      2>&1 | tee results/bingham_${cov}_sampler_ab.log"
done
run_once 900 results/so3_toy_sampler_ab.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.so3_toy --test \
    --sampler pf --sampler-steps 25 --ckpt weights/so3_toy_r3 \
    2>&1 | tee -a results/so3_toy_sampler_ab.log"

# 1) equiv-head arm: lr 1e-4 polish phase, 120k -> 240k
run_training results/protein_se3_equiv_train.jsonl 8 \
  python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
  --batch 16 --lr 1e-4 --frame-pool --cross-depth 2 --rel-frame \
  --equiv-head --bf16 --steps 240000 --ckpt weights/protein_se3_equiv \
  --ckpt-every 20000 --log results/protein_se3_equiv_train.jsonl \
  --print-every 500 --resume
run_once 1200 results/prot_se3_equiv_eval240.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
    --batch 16 --frame-pool --cross-depth 2 --rel-frame --equiv-head --bf16 \
    --test --ckpt weights/protein_se3_equiv \
    2>&1 | tee results/prot_se3_equiv_eval240.log"
run_once 1200 results/prot_se3_equiv_probe240.log \
  bash -c "python -u -m tools.probe_protein --ckpt weights/protein_se3_equiv \
    --frame-pool --cross-depth 2 --rel-frame --equiv-head --augment \
    2>&1 | tee results/prot_se3_equiv_probe240.log"

echo "QUEUE3 COMPLETE"
