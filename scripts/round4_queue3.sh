#!/bin/bash
# Round-4 TPU queue, part 3 — the 1M-divergence study + the queue-2 items
# that survived the machine restart (all round-3/round-4-part-1 checkpoints
# under weights/ were lost with the VM, so the PF A/B and 650k-snapshot
# items are re-planned around fresh retrains in queue 4).
#
# 1M-step divergence study (part 1 found the reference-protocol 1M aircraft
# run degrades: train loss + frozen probe rise monotonically from ~120k and
# the 1M checkpoint samples near the Haar prior).  Four 150k arms, same
# seed/config except one factor, all with --log-norms to capture grad/param
# norm trajectories:
#   A ctl    : --bf16 (exact reproduction of the degrading protocol)
#   B f32    : no --bf16       (bf16-compute causality)
#   C clip   : --bf16 --clip 1.0  (is it rare huge gradients?)
#   D lowlr  : --bf16 --lr 3e-5   (is constant 1e-4 just too hot late?)
# Loss at 140-160k cleanly separates "degrading" (>=0.45) from "healthy"
# (<=0.2) on the part-1 curve, so 150k arms suffice; quality evals come
# with the fixed 1M rerun in queue 4.
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

# 1) divergence study arms (150k each, bs32, K=8, --log-norms)
run_training results/div_ctl_train.jsonl 10 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --steps 150000 --steps-per-call 8 --log-norms \
  --ckpt weights/div_ctl --ckpt-every 50000 --print-every 2500 \
  --log results/div_ctl_train.jsonl
run_training results/div_f32_train.jsonl 10 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
  --steps 150000 --steps-per-call 8 --log-norms \
  --ckpt weights/div_f32 --ckpt-every 50000 --print-every 2500 \
  --log results/div_f32_train.jsonl
run_training results/div_clip_train.jsonl 10 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --clip 1.0 --steps 150000 --steps-per-call 8 --log-norms \
  --ckpt weights/div_clip --ckpt-every 50000 --print-every 2500 \
  --log results/div_clip_train.jsonl
run_training results/div_lowlr_train.jsonl 10 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --lr 3e-5 --steps 150000 --steps-per-call 8 --log-norms \
  --ckpt weights/div_lowlr --ckpt-every 50000 --print-every 2500 \
  --log results/div_lowlr_train.jsonl

# 2) MoE arm (50k, 4 experts) + dense control (50k), same seed/cadence
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
run_once 1800 results/aircraft_moe4_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --moe-experts 4 --test --max-shapes 128 \
    --ckpt weights/aircraft_moe4 2>&1 | tee results/aircraft_moe4_eval.log"
run_once 1800 results/aircraft_dense_ctl_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --test --max-shapes 128 \
    --ckpt weights/aircraft_dense_ctl 2>&1 | tee results/aircraft_dense_ctl_eval.log"

# 3) full bench (regression guard ran --quick in part 1 and flagged noisy
#    deltas; this is the calibrated run for BENCH_r04)
run_once 1800 results/bench_r4_full.log \
  bash -c "python -u bench.py 2>&1 | tee results/bench_r4_full.log"

echo "QUEUE R4-3 COMPLETE"
