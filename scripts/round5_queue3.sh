#!/bin/bash
# Round-5 TPU queue, part 3 — headline push A/B: does a deeper dispatch
# fusion (K=16/32) or the bf16 opt-state sweep move the 201 steps/s
# aircraft headline?  Two reps per arm (relay variance envelope).
set -x
cd "$(dirname "$0")/.."
WD=scripts/watchdog.sh
RW=scripts/relay_wait.sh

# wait for queue 2 to release the chip
for p in $(cat /tmp/q5r5b.pid 2>/dev/null); do
  while kill -0 "$p" 2>/dev/null; do sleep 60; done
done
bash "$RW"

LOG=results/headline_ab_r5.log
: > "$LOG"
for rep in a b; do
  for arm in "k8:" "k16:--steps-per-call 16" "k32:--steps-per-call 32" \
             "k8_opt:--headline-opt" \
             "k16_opt:--steps-per-call 16 --headline-opt"; do
    name=${arm%%:*}; flags=${arm#*:}
    echo "=== ARM $name rep $rep ===" >> "$LOG"
    "$WD" 1500 "$LOG" -- bash -c \
      "python -u bench.py --headline-only $flags 2>&1 | tail -2 >> $LOG" \
      || bash "$RW"
  done
done
echo "QUEUE R5-3 COMPLETE" >> "$LOG"
echo "QUEUE R5-3 COMPLETE"
