#!/bin/bash
# Round-3 TPU queue, part 4 — the CAUSAL test of the euler-aircraft
# structural-failure diagnosis.  Round 3 proved the reference's own
# euler arm also samples at the Haar prior (BENCHMARKS.md); the named
# mechanism is the eval-time chain init (Haar-euler decomposition,
# aircraft_test.py:80-83) sitting far outside the forward marginal
# q(x_{T-1}|x_0) = N(0, 1-acp).  If that diagnosis is right, evaluating
# the SAME trained euler checkpoints with a marginal-matched Gaussian
# init (--euler-init marginal, beyond-reference) should move the median
# off the prior; if it stays at the prior, the binding cause is the
# euler aliasing (projection is periodic in the angles, the regression
# target is not), not the init.
set -x
cd "$(dirname "$0")/.."
WD=scripts/watchdog.sh
RW=scripts/relay_wait.sh

# wait for any prior queue to release the relay (one process at a time)
if [ -f /tmp/queue3.pid ]; then
  while kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; do sleep 60; done
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

# 1) matched-config arm (same checkpoint as the cross-implementation
#    comparison), haar vs marginal init side by side
run_once 1200 results/aircraft_eul_matched_marginal_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --bf16 \
    --dim 128 --heads 2 --layers 2 --samples 64 \
    --test --max-shapes 128 --euler-init marginal \
    --ckpt weights/aircraft_eul_matched \
    2>&1 | tee results/aircraft_eul_matched_marginal_eval.log"

# 2) full-scale round-2 euler checkpoint (400k steps, d512)
run_once 1800 results/aircraft_eul_r2_marginal_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --bf16 \
    --test --max-shapes 128 --euler-init marginal \
    --ckpt weights/aircraft_eul_r2 \
    2>&1 | tee results/aircraft_eul_r2_marginal_eval.log"

echo "QUEUE4 COMPLETE"
