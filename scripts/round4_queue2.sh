#!/bin/bash
# Round-4 TPU queue, part 2 — runs after part 1 (1M aircraft + eval).
#
# VERDICT.md (round 3) items:
#  1. ProtNet MFU: roofline breakdown + round-4 layout changes (bf16 conv
#     stack, fused receptor+ligand encoder pass, fused-QKV A/B).
#  3. MoE arm: first trained EP evidence — 50k MoE-4 vs 50k dense control
#     at matched per-token FLOPs, expert-utilization trace in the jsonl.
#  4. Second seed for the equiv-head protein arm (full 240k two-phase
#     recipe from round3_queue7, --seed 1).
#  5. PF-flow fix A/B on the round-3 240k checkpoint: fixed
#     prediction-anchored flow vs the legacy read-back variant.
# Plus: full test suite with --durations (fast-tier data) while the chip
# is otherwise idle, and a full bench.py for the regression guard.
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

# 0) wait for part 1 to finish (marker in its log)
while ! grep -q "QUEUE R4-1 COMPLETE" results/round4_queue.log; do
  sleep 60
done
bash "$RW"

# 1) full test suite with per-test durations (chip idle; CPU-mesh tests)
run_once 1800 results/pytest_r4.log \
  bash -c "JAX_PLATFORMS=cpu timeout 2700 python -m pytest tests/ -q \
    --durations=40 2>&1 | tee results/pytest_r4.log"

# 2) protein roofline + layout A/B on the real chip
run_once 900 results/protein_roofline.log \
  bash -c "python -u tools/protein_roofline.py --batch 16 \
    2>&1 | tee results/protein_roofline.log"
run_once 900 results/protein_roofline_b4.log \
  bash -c "python -u tools/protein_roofline.py --batch 4 --quick \
    2>&1 | tee results/protein_roofline_b4.log"

# 3) quick bench: regression guard on-chip + new protein rows
run_once 900 results/bench_r4_quick.log \
  bash -c "python -u bench.py --quick 2>&1 | tee results/bench_r4_quick.log"

# 3b) eval-vs-budget point: the 650k snapshot taken before orbax's
#     keep-3 retention deleted it (200k row already recorded in r3)
run_once 1800 results/aircraft_so3_650k_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --test --max-shapes 128 --ckpt weights/aircraft_so3_snap \
    2>&1 | tee results/aircraft_so3_650k_eval.log"

# 4) MoE arm (50k, 4 experts) + dense control (50k), same seed/cadence
run_training results/aircraft_moe4_train.jsonl 10 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
  --moe-experts 4 --steps 50000 --bf16 --steps-per-call 8 \
  --ckpt weights/aircraft_moe4 --ckpt-every 10000 --print-every 1000 \
  --log results/aircraft_moe4_train.jsonl
run_training results/aircraft_dense_ctl_train.jsonl 10 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
  --steps 50000 --bf16 --steps-per-call 8 \
  --ckpt weights/aircraft_dense_ctl --ckpt-every 10000 --print-every 1000 \
  --log results/aircraft_dense_ctl_train.jsonl
# eval both 50k arms under the corrected percentile protocol
run_once 1800 results/aircraft_moe4_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --moe-experts 4 --test --max-shapes 128 \
    --ckpt weights/aircraft_moe4 2>&1 | tee results/aircraft_moe4_eval.log"
run_once 1800 results/aircraft_dense_ctl_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --test --max-shapes 128 \
    --ckpt weights/aircraft_dense_ctl 2>&1 | tee results/aircraft_dense_ctl_eval.log"

# 5) PF-flow fix A/B on the ROUND-3 240k equiv checkpoint
for m in flow flow-state; do
  run_once 1500 "results/prot_se3_equiv_eval240_pf50_${m}.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
      --batch 16 --frame-pool --cross-depth 2 --rel-frame --equiv-head --bf16 \
      --test --sampler pf --pf-method $m --sampler-steps 50 \
      --ckpt weights/protein_se3_equiv \
      2>&1 | tee results/prot_se3_equiv_eval240_pf50_${m}.log"
done

# 6) equiv-head arm, SEED 1, full two-phase 240k recipe (round3_queue7)
run_training results/protein_se3_equiv_s1_train.jsonl 15 \
  python -u -m diffusion_extensions_tpu.experiments.protein --se3 --seed 1 \
  --batch 16 --lr 3e-4 --frame-pool --cross-depth 2 --rel-frame \
  --equiv-head --bf16 --steps 120000 --ckpt weights/protein_se3_equiv_s1 \
  --ckpt-every 20000 --log results/protein_se3_equiv_s1_train.jsonl \
  --print-every 500
run_training results/protein_se3_equiv_s1_train.jsonl 15 \
  python -u -m diffusion_extensions_tpu.experiments.protein --se3 --seed 1 \
  --batch 16 --lr 1e-4 --frame-pool --cross-depth 2 --rel-frame \
  --equiv-head --bf16 --steps 240000 --ckpt weights/protein_se3_equiv_s1 \
  --ckpt-every 20000 --log results/protein_se3_equiv_s1_train.jsonl \
  --print-every 500 --resume
# evals: ancestral + ddim50 + fixed pf50 on the seed-1 240k checkpoint
run_once 1500 results/prot_se3_equiv_s1_eval240.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
    --seed 1 --batch 16 --frame-pool --cross-depth 2 --rel-frame \
    --equiv-head --bf16 --test --ckpt weights/protein_se3_equiv_s1 \
    2>&1 | tee results/prot_se3_equiv_s1_eval240.log"
for smp in ddim pf; do
  run_once 1500 "results/prot_se3_equiv_s1_eval240_${smp}50.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
      --seed 1 --batch 16 --frame-pool --cross-depth 2 --rel-frame \
      --equiv-head --bf16 --test --sampler $smp --sampler-steps 50 \
      --ckpt weights/protein_se3_equiv_s1 \
      2>&1 | tee results/prot_se3_equiv_s1_eval240_${smp}50.log"
done

echo "QUEUE R4-2 COMPLETE"
