#!/bin/bash
# Round-5 TPU queue, part 6 — re-run of the queue-4 flagship quality gate
# (its checkpoint + logs were wiped with the session restart before the
# 200k run finished; results/round5_queue4.log records the lost partial).
#
#  A) aircraft clip-1.0 200k retrain with the production optimizer config
#     (--opt-impl fused --opt-state-dtype bf16), seed 0, matched to the
#     round-4 f32 recipe (scripts/round4_queue6.sh:98) -> does bf16
#     opt-state keep the flagship's p50 0.02 / p99 0.05 quality?  This is
#     the quality evidence gating the headline-config flip to the
#     production optimizer (BENCHMARKS.md "Headline A/B").
set -x
cd "$(dirname "$0")/.."
WD=scripts/watchdog.sh
RW=scripts/relay_wait.sh

# wait for queue 5 (wrapper pid) to release the chip
for p in $(cat /tmp/q5r5_relaunch.pid 2>/dev/null); do
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

# ---- A) aircraft bf16-opt-state quality arm ------------------------------
run_training results/aircraft_so3_optbf16_train.jsonl 20 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --seed 0 --clip 1.0 --steps 200000 --steps-per-call 8 --log-norms \
  --opt-impl fused --opt-state-dtype bf16 \
  --ckpt weights/aircraft_so3_optbf16 --ckpt-every 50000 \
  --print-every 5000 --log results/aircraft_so3_optbf16_train.jsonl
"$WD" 1800 results/aircraft_so3_optbf16_eval.log -- \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --seed 0 --test --max-shapes 128 \
    --ckpt weights/aircraft_so3_optbf16 \
    2>&1 | tee results/aircraft_so3_optbf16_eval.log" || bash "$RW"
echo "QUEUE R5-6 COMPLETE"
