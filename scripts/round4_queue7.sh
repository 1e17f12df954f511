#!/bin/bash
# Round-4 TPU queue, part 7 — follow-ups that need the chip after queue6:
#  1. rerun the 200k budget-matched snapshot eval that died on the
#     opt-state structure mismatch (fixed: eval restores params-only)
#  2. roofline rerun with the fused-adam / clip A/B arms (and the
#     corrected per-step FLOPs for the k8 rows)
#  3. bench.py --quick sanity pass on the new protein bench path +
#     regression guard before the driver's round-end full run
set -x
cd "$(dirname "$0")/.."
WD=scripts/watchdog.sh
RW=scripts/relay_wait.sh

# wait for queue6 (single chip — one process at a time)
if [ -f /tmp/q6.pid ]; then
  while kill -0 "$(cat /tmp/q6.pid)" 2>/dev/null; do sleep 60; done
fi
bash "$RW"

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

run_once 1800 results/aircraft_so3_fix_200k_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --test --max-shapes 128 --ckpt weights/aircraft_so3_fix_200k \
    2>&1 | tee results/aircraft_so3_fix_200k_eval.log"

run_once 900 results/protein_roofline_r4c.log \
  bash -c "python -u tools/protein_roofline.py --batch 16 \
    2>&1 | tee results/protein_roofline_r4c.log"

run_once 1200 results/bench_quick_r4b.log \
  bash -c "python -u bench.py --quick 2>&1 | tee results/bench_quick_r4b.log"

echo "QUEUE R4-7 COMPLETE"
