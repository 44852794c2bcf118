#!/usr/bin/env bash
# Round-4f TPU session: finish the reference-scale training sweep.
# The r4d attempt lost accum4/accum8 to 1500 s timeouts — the remote AOT
# compile of the 2K train step alone took >25 min that day.  Two fixes:
# longer per-item timeouts, and the JAX persistent compilation cache so a
# completed compile is never paid twice across items/sessions.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=logs/bench_train_r4f.jsonl
: > "$OUT"

for tag in 2k_b8_accum4_standard 2k_b8_accum8_standard; do
  echo "=== train sweep: $tag ===" >&2
  if ! timeout 3300 python scripts/bench_train.py --only "$tag" >> "$OUT" \
      2> "logs/train_${tag}_r4f.err"; then
    echo "{\"metric\": \"train_steps_per_sec[$tag]\", \"error\": \"failed (see logs/train_${tag}_r4f.err)\"}" >> "$OUT"
  fi
done
echo "=== r4f session done ===" >&2
