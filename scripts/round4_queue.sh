#!/bin/bash
# Round-4 TPU queue, part 1 — the flagship at the reference's own budget.
#
# VERDICT.md (round 3) item 2: the aircraft so3 arm has only ever been
# trained to 200k steps; the reference trains 1M @ batch 32
# (/root/reference/aircraft_rotate.py:16-18,103).  The round-3 checkpoint
# at weights/aircraft_so3/200000 survived the VM, so this is a true
# orbax resume 200k -> 1M (battle-testing the resume path across queue
# sessions, as the verdict asked), followed by the corrected-eval
# percentile table on the 1M checkpoint.
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

# 1) resume the round-3 200k checkpoint out to the reference's 1M budget.
#    Same config as the 200k headline run (batch 32, lr 1e-4, d512/4h/4l,
#    bf16, K=8 dispatch fusion); finer print cadence for the loss curve.
run_training results/aircraft_so3_train_r3.jsonl 30 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
  --steps 1000000 --bf16 --steps-per-call 8 \
  --ckpt weights/aircraft_so3 --ckpt-every 25000 --print-every 5000 \
  --log results/aircraft_so3_train_r3.jsonl --resume

# 2) corrected-eval percentile table at 1M (same protocol as the 200k row:
#    128 test shapes x 8 samples, random point subsample)
run_once 1800 results/aircraft_so3_1m_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
    --test --max-shapes 128 --ckpt weights/aircraft_so3 \
    2>&1 | tee results/aircraft_so3_1m_eval.log"

echo "QUEUE R4-1 COMPLETE"
