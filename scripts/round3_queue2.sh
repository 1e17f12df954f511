#!/bin/bash
# Round-3 TPU queue, part 2 — remaining jobs after the relay hangs, run
# under the stall watchdog (scripts/watchdog.sh) with relay-recovery waits
# and --resume retries for the trainers.  Priorities: the two protein
# arms first (headline quality results), then the toy + sampler A/Bs,
# the sweep demo, and the bench.
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
    set -- "$@" --resume
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

# 1) protein equivariant-head arm (the augmented-protocol fix candidate)
run_training results/protein_se3_equiv_train.jsonl 6 \
  python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
  --batch 16 --lr 3e-4 --frame-pool --cross-depth 2 --rel-frame \
  --equiv-head --bf16 --steps 120000 --ckpt weights/protein_se3_equiv \
  --ckpt-every 20000 --log results/protein_se3_equiv_train.jsonl \
  --print-every 500
run_once 1200 results/prot_se3_equiv_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
    --batch 16 --frame-pool --cross-depth 2 --rel-frame --equiv-head --bf16 \
    --test --ckpt weights/protein_se3_equiv \
    2>&1 | tee results/prot_se3_equiv_eval.log"
run_once 1200 results/prot_se3_equiv_probe.log \
  bash -c "python -u -m tools.probe_protein --ckpt weights/protein_se3_equiv \
    --frame-pool --cross-depth 2 --rel-frame --equiv-head --augment \
    2>&1 | tee results/prot_se3_equiv_probe.log"

# 2) resume the cross-attention arm to its full 120k budget
run_training results/protein_se3_xattn_train.jsonl 6 \
  python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
  --batch 16 --lr 3e-4 --frame-pool --cross-depth 2 --rel-frame --bf16 \
  --steps 120000 --ckpt weights/protein_se3_xattn --ckpt-every 20000 \
  --log results/protein_se3_xattn_train.jsonl --print-every 500 --resume
run_once 1200 results/prot_se3_xattn_eval2.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
    --batch 16 --frame-pool --cross-depth 2 --rel-frame --bf16 \
    --test --ckpt weights/protein_se3_xattn \
    2>&1 | tee results/prot_se3_xattn_eval2.log"
run_once 1200 results/prot_se3_xattn_probe2.log \
  bash -c "python -u -m tools.probe_protein --ckpt weights/protein_se3_xattn \
    --frame-pool --cross-depth 2 --rel-frame --augment \
    2>&1 | tee results/prot_se3_xattn_probe2.log"

# 3) so3 toy retrain + sampler A/B
run_training results/so3_toy_r3_train.jsonl 4 \
  python -u -m diffusion_extensions_tpu.experiments.so3_toy \
  --steps 200000 --ckpt weights/so3_toy_r3 \
  --log results/so3_toy_r3_train.jsonl --print-every 5000 --ckpt-every 50000
rm -f results/so3_toy_sampler_ab.log
for s in "ancestral 1000" "ddim 50" "ddim 20" "pf 25"; do
  set -- $s
  run_once 900 results/so3_toy_sampler_ab.log \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.so3_toy --test \
      --sampler $1 --sampler-steps $2 --ckpt weights/so3_toy_r3 \
      2>&1 | tee -a results/so3_toy_sampler_ab.log"
done

# 4) sur/scr sampler A/B re-run (their first pass predates the PF
#    marginal-consistency fix; lcr/lur already ran with it)
for cov in sur scr; do
  run_once 900 "results/bingham_${cov}_sampler_ab.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.bingham $cov \
      --test --sampler-ab --ckpt weights/bingham_${cov}_r3 \
      2>&1 | tee results/bingham_${cov}_sampler_ab.log"
done

# 5) metric-driven sweep demonstration on the lock suite
run_once 900 results/sweep_lock_r3.log \
  bash -c "python -u tools/sweep.py lock \
    --grid '{\"lr\": [3e-4, 1e-3], \"batch\": [32, 64]}' \
    --steps 5000 --metric loss --agg mean10 --out sweeps/lock_r3 \
    -- --param so3 --print-every 500 \
    2>&1 | tee results/sweep_lock_r3.log"

# 6) full multi-workload bench (+ K=16 headroom probe)
run_once 2400 results/bench_r3.log \
  bash -c "python -u bench.py 2>&1 | tee results/bench_r3.log"
run_once 1500 results/bench_r3_k16.log \
  bash -c "python -u bench.py --quick --headline-only --steps-per-call 16 \
    2>&1 | tee results/bench_r3_k16.log"

echo "QUEUE2 COMPLETE"
