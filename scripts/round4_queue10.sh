#!/bin/bash
# Round-4 TPU queue, part 10 — runs after queue 9 (waits on /tmp/q9.pid).
# Short calibrated-measurement items for the round-4 record:
#   1) FULL bench (non-quick): calibrated headline + all rows, incl. the
#      new protein_train_b32 row and the xla_conv ProtNet default —
#      settles whether the quick-mode -4.6% headline drift was variance.
#   2) bf16 optimizer-state A/B arms (roofline --only-ab): the
#      HBM-bandwidth lever on the bandwidth-bound optimizer sweep.
#   3) bf16-vs-f32 opt-state loss parity: 2x5k-step protein arms, same
#      seed/protocol, JSONL windows compared in BENCHMARKS.
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

# ---- 0) wait for queue 9 to release the chip ---------------------------
# /tmp/q9.pid holds the launch wrapper (2258); the queue script itself is
# its child (2261).  Wait on BOTH explicit pids so a decoupled wrapper
# exit cannot start us while the chip is still owned.
for p in $(cat /tmp/q9.pid 2>/dev/null) 2261; do
  while kill -0 "$p" 2>/dev/null; do sleep 60; done
done
bash "$RW"

# ---- 1) calibrated full bench ------------------------------------------
run_once 1800 results/bench_r4_full.log \
  bash -c "python -u bench.py 2>&1 | tee results/bench_r4_full.log"
echo "QUEUE R4-10 BENCH DONE"

# ---- 2) bf16 opt-state step-rate A/B -----------------------------------
run_once 1200 results/protein_roofline_r4d.log \
  bash -c "python -u tools/protein_roofline.py --batch 16 \
    --only-ab xla_conv,xla_conv+fused_adam,xla_conv+bf16_state \
    2>&1 | tee results/protein_roofline_r4d.log"
echo "QUEUE R4-10 ROOFLINE DONE"

# ---- 3) bf16 opt-state loss parity (matched seed/data order) -----------
for arm in f32 bf16; do
  run_once 900 "results/protein_optstate_${arm}_train.jsonl" \
    python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
      --seed 0 --batch 16 --lr 3e-4 --frame-pool --cross-depth 2 \
      --rel-frame --equiv-head --bf16 --steps 5000 \
      --opt-impl fused --opt-state-dtype "$arm" \
      --ckpt "weights/protein_optstate_$arm" \
      --log "results/protein_optstate_${arm}_train.jsonl" --print-every 250
done
echo "QUEUE R4-10 COMPLETE"
