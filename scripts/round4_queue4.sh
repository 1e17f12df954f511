#!/bin/bash
# Round-4 TPU queue, part 4 — the queue-2 items lost with the VM restart
# (all checkpoints under weights/ were wiped), re-planned as fresh runs:
#
#  VERDICT item 4: equiv-head protein arm, SEED 1, full two-phase 240k
#    recipe (phase 1: lr 3e-4 to 120k; phase 2: lr 1e-4 to 240k).
#  VERDICT item 5: PF-flow fix A/B — the round-3 240k checkpoint is gone,
#    so the fixed (prediction-anchored, --pf-method flow) vs legacy
#    read-back (--pf-method flow-state) A/B runs on the fresh seed-1
#    checkpoint instead.  ancestral + ddim50 evals give the quality row.
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

# 0) wait for queue 5 (the stabilized 1M aircraft rerun) to finish
while ! grep -q "QUEUE R4-5 COMPLETE" results/round4_queue5.log; do
  sleep 60
done
bash "$RW"

# 1) equiv-head arm, SEED 1, full two-phase 240k recipe (round3_queue7)
run_training results/protein_se3_equiv_s1_train.jsonl 15 \
  python -u -m diffusion_extensions_tpu.experiments.protein --se3 --seed 1 \
  --batch 16 --lr 3e-4 --frame-pool --cross-depth 2 --rel-frame \
  --equiv-head --bf16 --steps 120000 --ckpt weights/protein_se3_equiv_s1 \
  --ckpt-every 20000 --log results/protein_se3_equiv_s1_train.jsonl \
  --print-every 500
run_training results/protein_se3_equiv_s1_train.jsonl 15 \
  python -u -m diffusion_extensions_tpu.experiments.protein --se3 --seed 1 \
  --batch 16 --lr 1e-4 --frame-pool --cross-depth 2 --rel-frame \
  --equiv-head --bf16 --steps 240000 --ckpt weights/protein_se3_equiv_s1 \
  --ckpt-every 20000 --log results/protein_se3_equiv_s1_train.jsonl \
  --print-every 500 --resume

# 2) evals on the seed-1 240k checkpoint: ancestral + ddim50 + the PF A/B
#    (fixed prediction-anchored flow vs legacy read-back flow-state)
run_once 1500 results/prot_se3_equiv_s1_eval240.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
    --seed 1 --batch 16 --frame-pool --cross-depth 2 --rel-frame \
    --equiv-head --bf16 --test --ckpt weights/protein_se3_equiv_s1 \
    2>&1 | tee results/prot_se3_equiv_s1_eval240.log"
run_once 1500 results/prot_se3_equiv_s1_eval240_ddim50.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
    --seed 1 --batch 16 --frame-pool --cross-depth 2 --rel-frame \
    --equiv-head --bf16 --test --sampler ddim --sampler-steps 50 \
    --ckpt weights/protein_se3_equiv_s1 \
    2>&1 | tee results/prot_se3_equiv_s1_eval240_ddim50.log"
run_once 1500 results/prot_se3_equiv_s1_eval240_pf50_flow.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
    --seed 1 --batch 16 --frame-pool --cross-depth 2 --rel-frame \
    --equiv-head --bf16 --test --sampler pf --pf-method flow \
    --sampler-steps 50 --ckpt weights/protein_se3_equiv_s1 \
    2>&1 | tee results/prot_se3_equiv_s1_eval240_pf50_flow.log"
run_once 1500 results/prot_se3_equiv_s1_eval240_pf50_flowstate.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
    --seed 1 --batch 16 --frame-pool --cross-depth 2 --rel-frame \
    --equiv-head --bf16 --test --sampler pf --pf-method flow-state \
    --sampler-steps 50 --ckpt weights/protein_se3_equiv_s1 \
    2>&1 | tee results/prot_se3_equiv_s1_eval240_pf50_flowstate.log"

echo "QUEUE R4-4 COMPLETE"

# 7) MoE dispatch throughput A/B on the real chip (onehot vs the round-4
#    O(T*D) scatter dispatch), short measured runs at the MoE-arm config
for disp in onehot scatter; do
  run_once 900 "results/aircraft_moe4_disp_${disp}.jsonl" \
    python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --moe-experts 4 --moe-dispatch "$disp" --steps 3000 \
    --steps-per-call 8 --print-every 500 \
    --log "results/aircraft_moe4_disp_${disp}.jsonl"
done

echo "QUEUE R4-4B COMPLETE"
