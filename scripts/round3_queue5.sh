#!/bin/bash
# Round-3 TPU queue, part 5 — trained-model evidence for the exact
# "flow" PF integrator on the real chip: re-run the Bingham sampler A/B
# (now ancestral / ddim / pf_flow_{50,10} / pf_{heun,euler} legacy rows)
# on all four presets, plus the toy PF re-run with the flow default.
set -x
cd "$(dirname "$0")/.."
WD=scripts/watchdog.sh
RW=scripts/relay_wait.sh

for q in /tmp/queue3.pid /tmp/queue4.pid; do
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

for cov in sur scr lcr lur; do
  run_once 1200 "results/bingham_${cov}_sampler_ab.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.bingham $cov \
      --test --sampler-ab --ckpt weights/bingham_${cov}_r3 \
      2>&1 | tee results/bingham_${cov}_sampler_ab.log"
done
run_once 900 results/so3_toy_sampler_ab.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.so3_toy --test \
    --sampler pf --sampler-steps 25 --ckpt weights/so3_toy_r3 \
    2>&1 | tee -a results/so3_toy_sampler_ab.log"

echo "QUEUE5 COMPLETE"
