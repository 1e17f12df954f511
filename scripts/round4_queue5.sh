#!/bin/bash
# Round-4 TPU queue, part 5 — the healthy 1M-step aircraft rerun
# (VERDICT item 2).  Part 1 ran the reference's exact constant-Adam
# protocol to 1M and it degrades (train loss + frozen probe rise from
# ~120k; the 1M checkpoint samples at the Haar prior).  The queue-3
# divergence study picks the minimal stabilizer; the winning flags are
# read from results/div_winner.flags (written by the session after
# reading the study), so this script is launched only once that file
# exists.  Runs the full 1M, then the corrected-eval percentile table.
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

# 0) wait for queue 3 + the study verdict (runs BEFORE the protein queue:
#    VERDICT ranks the full-budget flagship above the second protein seed,
#    so it should not sit behind a 100-minute protein retrain if stalls
#    eat the end of the round)
while ! grep -q "QUEUE R4-3 COMPLETE" results/round4_queue3.log; do
  sleep 60
done
while [ ! -f results/div_winner.flags ]; do sleep 60; done
STAB_FLAGS=$(cat results/div_winner.flags)
bash "$RW"

# 1) 1M-step aircraft so3 with the study-selected stabilizer
#    (reference budget: 1M steps @ batch 32, aircraft_rotate.py:16-18,103)
run_training results/aircraft_so3_1m_fix_train.jsonl 20 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  $STAB_FLAGS --steps 1000000 --steps-per-call 8 --log-norms \
  --ckpt weights/aircraft_so3_1m_fix --ckpt-every 100000 \
  --print-every 5000 --log results/aircraft_so3_1m_fix_train.jsonl

# 2) corrected-eval percentile table at 1M
run_once 1800 results/aircraft_so3_1m_fix_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --test --max-shapes 128 --ckpt weights/aircraft_so3_1m_fix \
    2>&1 | tee results/aircraft_so3_1m_fix_eval.log"

echo "QUEUE R4-5 COMPLETE"
