#!/bin/bash
# Round-4 TPU queue, part 6 — the consolidated remainder of the round-4
# plan after the second VM relay wiped weights/ again.  Ordering is
# cheap-items-first so more VERDICT items close per chip-hour, with the
# two long retrains (1M aircraft, 240k protein seed-1) at the back:
#
#  1. MoE dispatch throughput A/B (onehot vs scatter, 3k steps each) and
#     the winner is used for the 50k MoE arm          [VERDICT item 3]
#  2. MoE-4 50k arm + dense 50k control + corrected-eval on both
#  3. protein roofline rerun — the _Conv3 MXU lowering (14c2a70) landed
#     AFTER the last roofline, so its conv rows are stale [VERDICT item 1]
#  4. stabilized 1M aircraft (--clip 1.0, the queue-3 study winner),
#     staged at 200k for a budget-matched snapshot eval  [VERDICT item 2]
#  5. protein equiv-head arm, seed 1, two-phase 240k recipe + ancestral/
#     ddim50/pf-flow/pf-flow-state evals            [VERDICT items 4+5]
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

# ---- 1) MoE dispatch A/B -------------------------------------------------
for disp in onehot scatter; do
  run_once 900 "results/aircraft_moe4_disp_${disp}.jsonl" \
    python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --moe-experts 4 --moe-dispatch "$disp" --steps 3000 \
    --steps-per-call 8 --print-every 500 \
    --log "results/aircraft_moe4_disp_${disp}.jsonl"
done
DISP=$(python - <<'EOF'
import json
def last_sps(p):
    rows = [json.loads(l) for l in open(p)]
    return rows[-1]["steps_per_sec"]
o = last_sps("results/aircraft_moe4_disp_onehot.jsonl")
s = last_sps("results/aircraft_moe4_disp_scatter.jsonl")
print("scatter" if s > o else "onehot")
EOF
)
echo "MOE DISPATCH WINNER: $DISP"
echo "$DISP" > results/moe_dispatch_winner.txt

# ---- 2) MoE-4 50k arm + dense control + evals ----------------------------
run_training results/aircraft_moe4_train.jsonl 10 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
  --moe-experts 4 --moe-dispatch "$DISP" --steps 50000 --bf16 \
  --steps-per-call 8 --ckpt weights/aircraft_moe4 --ckpt-every 10000 \
  --print-every 1000 --log results/aircraft_moe4_train.jsonl
run_training results/aircraft_dense_ctl_train.jsonl 10 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
  --steps 50000 --bf16 --steps-per-call 8 \
  --ckpt weights/aircraft_dense_ctl --ckpt-every 10000 --print-every 1000 \
  --log results/aircraft_dense_ctl_train.jsonl
run_once 1800 results/aircraft_moe4_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --moe-experts 4 --moe-dispatch $DISP --test --max-shapes 128 \
    --ckpt weights/aircraft_moe4 2>&1 | tee results/aircraft_moe4_eval.log"
run_once 1800 results/aircraft_dense_ctl_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --test --max-shapes 128 --ckpt weights/aircraft_dense_ctl \
    2>&1 | tee results/aircraft_dense_ctl_eval.log"
echo "QUEUE R4-6 MOE DONE"

# ---- 3) protein roofline rerun (post-conv-lowering) ----------------------
run_once 900 results/protein_roofline_r4b.log \
  bash -c "python -u tools/protein_roofline.py --batch 16 \
    2>&1 | tee results/protein_roofline_r4b.log"

# ---- 4) stabilized 1M aircraft -------------------------------------------
# stage 1: to 200k, snapshot for a budget-matched eval vs the r3 headline
run_training results/aircraft_so3_1m_fix_train.jsonl 20 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --clip 1.0 --steps 200000 --steps-per-call 8 --log-norms \
  --ckpt weights/aircraft_so3_1m_fix --ckpt-every 50000 \
  --print-every 5000 --log results/aircraft_so3_1m_fix_train.jsonl
cp -r weights/aircraft_so3_1m_fix weights/aircraft_so3_fix_200k
run_once 1800 results/aircraft_so3_fix_200k_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --test --max-shapes 128 --ckpt weights/aircraft_so3_fix_200k \
    2>&1 | tee results/aircraft_so3_fix_200k_eval.log"
# stage 2: resume to the reference's full 1M budget
run_training results/aircraft_so3_1m_fix_train.jsonl 20 \
  python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --clip 1.0 --steps 1000000 --steps-per-call 8 --log-norms \
  --ckpt weights/aircraft_so3_1m_fix --ckpt-every 100000 \
  --print-every 5000 --log results/aircraft_so3_1m_fix_train.jsonl --resume
run_once 1800 results/aircraft_so3_1m_fix_eval.log \
  bash -c "python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 \
    --bf16 --test --max-shapes 128 --ckpt weights/aircraft_so3_1m_fix \
    2>&1 | tee results/aircraft_so3_1m_fix_eval.log"
echo "QUEUE R4-6 1M DONE"

# ---- 5) protein equiv-head seed-1 arm ------------------------------------
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
for ev in "ancestral:" "ddim:--sampler ddim --sampler-steps 50" \
          "pf_flow:--sampler pf --pf-method flow --sampler-steps 50" \
          "pf_flowstate:--sampler pf --pf-method flow-state --sampler-steps 50"; do
  name=${ev%%:*}; flags=${ev#*:}
  run_once 1500 "results/prot_se3_equiv_s1_eval_${name}.log" \
    bash -c "python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
      --seed 1 --batch 16 --frame-pool --cross-depth 2 --rel-frame \
      --equiv-head --bf16 --test $flags --ckpt weights/protein_se3_equiv_s1 \
      2>&1 | tee results/prot_se3_equiv_s1_eval_${name}.log"
done
echo "QUEUE R4-6 COMPLETE"
