#!/bin/bash
# Round-4 TPU queue, part 8 — mid-course reorder. The s1 protein arm runs
# at 24 steps/s, which would push queue6's remaining stages (240k phase 2
# + 4 evals) and all of queue7 past the round boundary. This queue runs
# the bounded-value items first at the 120k phase-1 checkpoint, then
# resumes s1 phase 2 as the open-ended tail job:
#  1. s1 evals at 120k: ancestral, ddim50, pf-flow (fixed), pf-flow-state
#     (legacy) — the two-seed row (VERDICT item 4) + the PF fix's first
#     trained-model A/B (item 5)
#  2. the 200k budget-matched aircraft snapshot eval (item 2 table row)
#  3. protein roofline r4c: fused-adam / sum3 / clip arms (item 1)
#  4. bench.py --quick sanity (new protein bench path + regression guard)
#  5. resume s1 to 240k until the round ends (ckpt every 20k survives)
# Launch AFTER killing queue6/queue7 by PID (never by pattern).
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

S1FLAGS="--se3 --seed 1 --batch 16 --frame-pool --cross-depth 2 --rel-frame --equiv-head --bf16"
for ev in "ancestral:" "ddim:--sampler ddim --sampler-steps 50" \
          "pf_flow:--sampler pf --pf-method flow --sampler-steps 50" \
          "pf_flowstate:--sampler pf --pf-method flow-state --sampler-steps 50"; do
  name=${ev%%:*}; flags=${ev#*:}
  run_once 1500 "results/prot_se3_equiv_s1_eval120_${name}.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.protein \
      $S1FLAGS --test $flags --ckpt weights/protein_se3_equiv_s1 \
      2>&1 | tee results/prot_se3_equiv_s1_eval120_${name}.log"
done
echo "QUEUE R4-8 S1 120K EVALS DONE"

run_once 1800 results/aircraft_so3_fix_200k_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --test --max-shapes 128 --ckpt weights/aircraft_so3_fix_200k \
    2>&1 | tee results/aircraft_so3_fix_200k_eval.log"

run_once 1200 results/protein_roofline_r4c.log \
  bash -c "python -u tools/protein_roofline.py --batch 16 \
    2>&1 | tee results/protein_roofline_r4c.log"

run_once 1200 results/bench_quick_r4b.log \
  bash -c "python -u bench.py --quick 2>&1 | tee results/bench_quick_r4b.log"
echo "QUEUE R4-8 MEASUREMENTS DONE"

# tail job: s1 phase 2 toward 240k (runs until the round ends; resumable)
run_training_tries=15
for i in $(seq 1 $run_training_tries); do
  "$WD" 600 results/protein_se3_equiv_s1_train.jsonl -- \
    python -u -m diffusion_extensions_tpu.experiments.protein --se3 --seed 1 \
    --batch 16 --lr 1e-4 --frame-pool --cross-depth 2 --rel-frame \
    --equiv-head --bf16 --steps 240000 --ckpt weights/protein_se3_equiv_s1 \
    --ckpt-every 20000 --log results/protein_se3_equiv_s1_train.jsonl \
    --print-every 500 --resume && break
  rc=$?
  if [ "$rc" -ne 42 ]; then exit "$rc"; fi
  bash "$RW" || exit 1
done
echo "QUEUE R4-8 COMPLETE"
