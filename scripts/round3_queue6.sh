#!/bin/bash
# Round-3 TPU queue, part 6 — does a deterministic chain cut the protein
# shift endpoint scatter?  The equiv-head arm's per-step shift MSE is
# excellent (probe 0.02-0.28 vs zero ~1.0) but the ancestral endpoint
# p50 sits ~7: the last-20-timestep posterior noise (sigma_t * 75) and
# low-t prediction error random-walk the endpoint.  DDIM-50 and the
# exact-flow PF-50 chains inject no noise, so their endpoints isolate
# the model's own low-t accuracy.  Evaluates the SAME 240k checkpoint
# with all three samplers under the faithful augmented protocol.
set -x
cd "$(dirname "$0")/.."
WD=scripts/watchdog.sh
RW=scripts/relay_wait.sh

for q in /tmp/queue3.pid /tmp/queue4.pid /tmp/queue5.pid; do
  if [ -f "$q" ]; then
    while kill -0 "$(cat $q)" 2>/dev/null; do sleep 60; done
  fi
done
bash "$RW"

run_once () {
  local stall=$1 prog=$2; shift 2
  for i in 1 2 3; do
    "$WD" "$stall" "$prog" -- "$@" && return 0
    rc=$?
    if [ "$rc" -ne 42 ]; then return "$rc"; fi
    "$RW" || return 1
  done
  return 42
}

for smp in ddim pf; do
  run_once 1500 "results/prot_se3_equiv_eval240_${smp}50.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
      --batch 16 --frame-pool --cross-depth 2 --rel-frame --equiv-head --bf16 \
      --test --sampler $smp --sampler-steps 50 \
      --ckpt weights/protein_se3_equiv \
      2>&1 | tee results/prot_se3_equiv_eval240_${smp}50.log"
done

echo "QUEUE6 COMPLETE"
