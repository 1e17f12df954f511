#!/bin/bash
# Round-4 TPU queue, part 9 — replaces queues 6(stage-5)/7/8 after two
# discoveries: (a) the K=8 grouping bug fed one augmented batch 8x per
# dispatch, invalidating the running s1 arm as a matched-protocol seed
# test (fixed in code; arm restarted with --steps-per-call 1 = the exact
# seed-0 protocol); (b) protein K-fusion is perf-neutral anyway.
# Order: short measurement items first so BENCHMARKS can be written
# while the retrain runs; evals land at the end of the round.
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

bash "$RW"

# ---- 1) aircraft 200k budget-matched snapshot eval (VERDICT item 2) ----
run_once 1800 results/aircraft_so3_fix_200k_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --test --max-shapes 128 --ckpt weights/aircraft_so3_fix_200k \
    2>&1 | tee results/aircraft_so3_fix_200k_eval.log"

# ---- 2) roofline r4c: fused-adam / sum3 / clip arms (VERDICT item 1) ---
run_once 1200 results/protein_roofline_r4c.log \
  bash -c "python -u tools/protein_roofline.py --batch 16 \
    2>&1 | tee results/protein_roofline_r4c.log"
echo "QUEUE R4-9 MEASUREMENTS DONE"

# ---- 3) s1 retrain, matched protocol (K=1), fresh dirs (item 4) --------
for i in $(seq 1 15); do
  "$WD" 600 results/protein_se3_equiv_s1b_train.jsonl -- \
    python -u -m diffusion_extensions_tpu.experiments.protein --se3 --seed 1 \
    --batch 16 --lr 3e-4 --steps-per-call 1 --frame-pool --cross-depth 2 \
    --rel-frame --equiv-head --bf16 --steps 120000 \
    --ckpt weights/protein_se3_equiv_s1b --ckpt-every 20000 \
    --log results/protein_se3_equiv_s1b_train.jsonl --print-every 500 \
    --resume && break
  rc=$?
  if [ "$rc" -ne 42 ]; then exit "$rc"; fi
  bash "$RW" || exit 1
done
echo "QUEUE R4-9 S1B 120K DONE"

# ---- 4) s1b evals (items 4+5); ancestral/ddim first ---------------------
for ev in "ancestral:" "ddim:--sampler ddim --sampler-steps 50" \
          "pf_flow:--sampler pf --pf-method flow --sampler-steps 50" \
          "pf_flowstate:--sampler pf --pf-method flow-state --sampler-steps 50"; do
  name=${ev%%:*}; flags=${ev#*:}
  run_once 1500 "results/prot_se3_equiv_s1b_eval120_${name}.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
      --seed 1 --batch 16 --frame-pool --cross-depth 2 --rel-frame \
      --equiv-head --bf16 --test $flags --ckpt weights/protein_se3_equiv_s1b \
      2>&1 | tee results/prot_se3_equiv_s1b_eval120_${name}.log"
done
echo "QUEUE R4-9 EVALS DONE"

# ---- 5) bench quick sanity (driver runs the full bench at round end) ---
run_once 1200 results/bench_quick_r4b.log \
  bash -c "python -u bench.py --quick 2>&1 | tee results/bench_quick_r4b.log"
echo "QUEUE R4-9 COMPLETE"
