#!/bin/bash
# Round-5 TPU queue, part 1 — the closure measurements (VERDICT r4):
#   A) protein b4 row diagnosis: roofline arms at batch 4 — is the full-
#      bench -24.4% drift relay variance, and does K-fused dispatch or
#      bf16 opt-state lift the latency-bound row? (items 3+6)  Run twice
#      for within-session repeatability.
#   B) b32 bf16-opt-state roofline arm (item 4's missing batch point).
#   C) s1b polish 120k -> 240k at lr 1e-4 (matched headline protocol,
#      item 1), then the 4 evals on the SAME 240k checkpoint — which is
#      also the same-checkpoint PF-flow fix A/B (item 2).
#   D) aircraft seed-1 clip-stabilized 200k retrain + eval (item 5).
#   E) calibrated full bench with the new per-row regression guard.
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

run_training () {  # run_training <progress_file> <max_tries> cmd...
  local prog=$1 tries=$2; shift 2
  for i in $(seq 1 "$tries"); do
    "$WD" 600 "$prog" -- "$@" && return 0
    rc=$?
    if [ "$rc" -ne 42 ]; then return "$rc"; fi
    "$RW" || return 1
  done
  return 42
}

# ---- 0) wait for queue 10 (round 4) to release the chip -----------------
for p in $(cat /tmp/q10.pid 2>/dev/null); do
  while kill -0 "$p" 2>/dev/null; do sleep 60; done
done
bash "$RW"

# ---- A) protein b4 roofline arms, twice --------------------------------
for rep in a b; do
  run_once 1200 "results/protein_roofline_r5_b4${rep}.log" \
    bash -c "python -u tools/protein_roofline.py --batch 4 \
      --only-ab xla_conv,xla_conv+k8,xla_conv+bf16_state,xla_conv+k8+bf16_state \
      2>&1 | tee results/protein_roofline_r5_b4${rep}.log"
done
echo "QUEUE R5 B4 ROOFLINE DONE"

# ---- B) b32 bf16-state roofline arm -------------------------------------
run_once 1500 results/protein_roofline_r5_b32.log \
  bash -c "python -u tools/protein_roofline.py --batch 32 \
    --only-ab xla_conv,xla_conv+bf16_state \
    2>&1 | tee results/protein_roofline_r5_b32.log"
echo "QUEUE R5 B32 ROOFLINE DONE"

# ---- C) s1b polish 120k -> 240k (seed-1 headline protocol) --------------
run_training results/protein_se3_equiv_s1b_train.jsonl 15 \
  python -u -m diffusion_extensions_tpu.experiments.protein --se3 --seed 1 \
  --batch 16 --lr 1e-4 --steps-per-call 1 --frame-pool --cross-depth 2 \
  --rel-frame --equiv-head --bf16 --steps 240000 \
  --ckpt weights/protein_se3_equiv_s1b --ckpt-every 20000 \
  --log results/protein_se3_equiv_s1b_train.jsonl --print-every 500 \
  --resume
echo "QUEUE R5 S1B 240K DONE"

# same-checkpoint evals: canonical-matrix rows + PF-flow fix A/B
for ev in "ancestral:" "ddim:--sampler ddim --sampler-steps 50" \
          "pf_flow:--sampler pf --pf-method flow --sampler-steps 50" \
          "pf_flowstate:--sampler pf --pf-method flow-state --sampler-steps 50"; do
  name=${ev%%:*}; flags=${ev#*:}
  run_once 1500 "results/prot_se3_equiv_s1b_eval240_${name}.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
      --seed 1 --batch 16 --frame-pool --cross-depth 2 --rel-frame \
      --equiv-head --bf16 --test $flags --ckpt weights/protein_se3_equiv_s1b \
      2>&1 | tee results/prot_se3_equiv_s1b_eval240_${name}.log"
done
echo "QUEUE R5 S1B EVALS DONE"

# ---- D) aircraft seed-1 clip-stabilized 200k + budget-matched eval ------
run_training results/aircraft_so3_fix_s1_train.jsonl 20 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --seed 1 --clip 1.0 --steps 200000 --steps-per-call 8 --log-norms \
  --ckpt weights/aircraft_so3_fix_s1 --ckpt-every 50000 \
  --print-every 5000 --log results/aircraft_so3_fix_s1_train.jsonl
run_once 1800 results/aircraft_so3_fix_s1_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --seed 1 --test --max-shapes 128 --ckpt weights/aircraft_so3_fix_s1 \
    2>&1 | tee results/aircraft_so3_fix_s1_eval.log"
echo "QUEUE R5 AIRCRAFT S1 DONE"

# ---- E) calibrated full bench (per-row guard active) ---------------------
run_once 1800 results/bench_r5_full.log \
  bash -c "python -u bench.py 2>&1 | tee results/bench_r5_full.log"
echo "QUEUE R5 COMPLETE"
