#!/bin/bash
# Round-3 serial TPU queue (the axon relay serializes one process at a
# time).  Assumes the protein cross-attention arm has already finished.
# Order: cheap evals first, then the matched-config aircraft arms for the
# euler cross-implementation comparison, then the Bingham matrix with the
# trained-model sampler A/B, the so3 toy A/B, a metric-driven sweep
# demonstration, and the full multi-workload bench last.
set -x
cd "$(dirname "$0")/.."

# 1) protein cross-attention arm: augmented-protocol eval + per-block probe
python -u -m diffusion_extensions_tpu.experiments.protein --se3 \
  --batch 16 --frame-pool --cross-depth 2 --rel-frame --bf16 \
  --test --ckpt weights/protein_se3_xattn \
  2>&1 | tee results/prot_se3_xattn_eval.log
python -u -m tools.probe_protein --ckpt weights/protein_se3_xattn \
  --frame-pool --cross-depth 2 --rel-frame --augment \
  2>&1 | tee results/prot_se3_xattn_probe.log

# 1.5) re-evaluate the round-2 flagship aircraft checkpoints under the
#      CORRECTED eval protocol (random point subsampling instead of the
#      head slice that yielded fuselage-only, near-axially-symmetric
#      clouds — see aircraft.test())
python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --test --max-shapes 128 --ckpt weights/aircraft_so3_r2 \
  2>&1 | tee results/aircraft_so3_r2_reeval.log
python -u -m diffusion_extensions_tpu.experiments.aircraft --bf16 \
  --test --max-shapes 128 --ckpt weights/aircraft_eul_r2 \
  2>&1 | tee results/aircraft_eul_r2_reeval.log

# 2) matched reduced-config aircraft arms (cross-implementation euler
#    comparison: same config/data/budget as tools/ref_euler_harness.py
#    train; so3 arm as the learnability control)
python -u -m diffusion_extensions_tpu.experiments.aircraft --bf16 \
  --dim 128 --heads 2 --layers 2 --samples 64 --steps-per-call 8 \
  --steps 20000 --ckpt weights/aircraft_eul_matched \
  --log results/aircraft_eul_matched_train.jsonl --print-every 500 \
  --ckpt-every 5000
python -u -m diffusion_extensions_tpu.experiments.aircraft --bf16 \
  --dim 128 --heads 2 --layers 2 --samples 64 \
  --test --max-shapes 128 --ckpt weights/aircraft_eul_matched \
  2>&1 | tee results/aircraft_eul_matched_eval.log
python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --dim 128 --heads 2 --layers 2 --samples 64 --steps-per-call 8 \
  --steps 20000 --ckpt weights/aircraft_so3_matched \
  --log results/aircraft_so3_matched_train.jsonl --print-every 500 \
  --ckpt-every 5000
python -u -m diffusion_extensions_tpu.experiments.aircraft --so3 --bf16 \
  --dim 128 --heads 2 --layers 2 --samples 64 \
  --test --max-shapes 128 --ckpt weights/aircraft_so3_matched \
  2>&1 | tee results/aircraft_so3_matched_eval.log

# 3) Bingham matrix retrain + trained-model sampler A/B (DDIM/PF evidence)
for cov in sur scr lcr lur; do
  python -u -m diffusion_extensions_tpu.experiments.bingham "$cov" \
    --steps 100000 --mmd-every 0 --ckpt "weights/bingham_${cov}_r3" \
    --log "results/bingham_${cov}_r3_train.jsonl" --print-every 5000 \
    --ckpt-every 100000
  python -u -m diffusion_extensions_tpu.experiments.bingham "$cov" \
    --test --sampler-ab --ckpt "weights/bingham_${cov}_r3" \
    2>&1 | tee "results/bingham_${cov}_sampler_ab.log"
done

# 4) so3 toy retrain + sampler A/B (mode-recovery medians)
python -u -m diffusion_extensions_tpu.experiments.so3_toy \
  --steps 200000 --ckpt weights/so3_toy_r3 \
  --log results/so3_toy_r3_train.jsonl --print-every 5000 --ckpt-every 50000
for s in "ancestral 1000" "ddim 50" "ddim 20" "pf 25"; do
  set -- $s
  python -u -m diffusion_extensions_tpu.experiments.so3_toy --test \
    --sampler "$1" --sampler-steps "$2" --ckpt weights/so3_toy_r3 \
    2>&1 | tee -a results/so3_toy_sampler_ab.log
done

# 5) metric-driven sweep demonstration on the lock suite
python -u tools/sweep.py lock \
  --grid '{"lr": [3e-4, 1e-3], "batch": [32, 64]}' \
  --steps 5000 --metric loss --agg mean10 --out sweeps/lock_r3 \
  -- --param so3 --print-every 500 \
  2>&1 | tee results/sweep_lock_r3.log

# 6) full multi-workload bench (+ a K=16 dispatch-fusion headroom probe)
python -u bench.py 2>&1 | tee results/bench_r3.log
python -u bench.py --quick --headline-only --steps-per-call 16 \
  2>&1 | tee results/bench_r3_k16.log
