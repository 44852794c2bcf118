#!/bin/sh
# One-shot TPU measurement session (run when the tunnel is up).  Ordered
# most-valuable-first so a short tunnel window still captures the headline:
#   1. bench.py headline (self-selects tap strategy; refreshes last-good)
#   2. 2K sweep: full + trimmed nets, all postures/taps (BASELINE.md row 1)
#   3. per-stage kernel A/B (plain taps / stack_taps / acc_shift)
#   4. training throughput incl. reference-scale 2K batch-8 accum sweep
# Writes JSON lines to logs/taps_tpu_$(date +%s).jsonl
set -e
cd "$(dirname "$0")/.."
OUT="logs/taps_tpu_$(date +%s).jsonl"
mkdir -p logs
echo "== bench.py headline ==" | tee -a "$OUT"
timeout 2400 python bench.py | tee -a "$OUT"
echo "== 2K sweep (full + trimmed, all postures/taps) ==" | tee -a "$OUT"
timeout 2400 python scripts/bench_2k.py | tee -a "$OUT"
echo "== per-stage kernel A/B ==" | tee -a "$OUT"
timeout 1200 python scripts/bench_convblock.py | tee -a "$OUT"
echo "== small-channel floor discrimination ==" | tee -a "$OUT"
timeout 1200 python scripts/bench_floor.py | tee -a "$OUT"
echo "== bench.py PCSS_CONVBLOCK_TAPS=acc_shift ==" | tee -a "$OUT"
PCSS_CONVBLOCK_TAPS=acc_shift timeout 1800 python bench.py | tee -a "$OUT"
echo "== training throughput (incl. reference-scale 2K accum sweep) ==" | tee -a "$OUT"
timeout 2400 python scripts/bench_train.py | tee -a "$OUT"
echo "wrote $OUT"
