#!/bin/sh
# One-shot TPU measurement session for the tap-strategy work:
#   1. per-stage kernel A/B (plain taps / stack_taps / acc_shift)
#   2. end-to-end headline under each strategy (bench.py)
#   3. trimmed w16 net at 2K under the best strategy
# Writes JSON lines to logs/taps_tpu_$(date +%s).jsonl
set -e
cd "$(dirname "$0")/.."
OUT="logs/taps_tpu_$(date +%s).jsonl"
mkdir -p logs
echo "== per-stage kernel A/B ==" | tee -a "$OUT"
timeout 1200 python scripts/bench_convblock.py | tee -a "$OUT"
for S in stack acc_shift; do
  echo "== bench.py PCSS_CONVBLOCK_TAPS=$S ==" | tee -a "$OUT"
  PCSS_CONVBLOCK_TAPS=$S timeout 1800 python bench.py | tee -a "$OUT"
done
echo "== 2K sweep (full + trimmed, all postures/taps) ==" | tee -a "$OUT"
timeout 2400 python scripts/bench_2k.py | tee -a "$OUT"
echo "== training throughput (incl. reference-scale 2K accum sweep) ==" | tee -a "$OUT"
timeout 2400 python scripts/bench_train.py | tee -a "$OUT"
echo "wrote $OUT"
