#!/usr/bin/env bash
# Round-4d TPU session: regenerate the COMMITTED raw-evidence logs that
# docs/BENCHMARKS.md cites.  Round 3's lesson repeated in round 4: raw
# measurement logs lived only in the working tree and were lost between
# sessions, leaving the doc's tables unverifiable.  This session re-runs
# the reference-scale training sweep (the paper's own 2048x1024 batch-8
# config) and writes resumable per-item JSONL that gets committed.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=logs/bench_train_r4d.jsonl
: > "$OUT"

for tag in 256crop_b8_standard 2k_b8_accum1_standard 2k_b8_accum2_standard \
           2k_b8_accum4_standard 2k_b8_accum8_standard; do
  echo "=== train sweep: $tag ===" >&2
  # plain `if timeout; then :; else rc=$?` — the else branch sees
  # timeout(1)'s real status (124 = timed out); the earlier `if !` form
  # captured the negation (always 0), which is why the committed
  # bench_train_r4d.jsonl carries misleading '"error": "exit 0"' rows —
  # those rows were in fact timeouts/OOMs (see the .err files)
  if timeout 1500 python scripts/bench_train.py --only "$tag" >> "$OUT" \
      2> "logs/train_${tag}_r4d.err"; then :; else
    rc=$?
    echo "{\"metric\": \"train_steps_per_sec[$tag]\", \"rc\": $rc, \"error\": \"failed rc=$rc (see logs/train_${tag}_r4d.err)\"}" >> "$OUT"
  fi
done
echo "=== r4d session done ===" >&2
