#!/usr/bin/env bash
# Round-4e TPU session, ordered most-valuable-first, per-item isolated:
#   1. re-run the per-unit chw diagnostic with the FIXED methodology
#      (weights as jit args — round 4 root-caused the "Mosaic wedge" as a
#      closed-over device constant being fetched through the tunnel at
#      lower() time, scripts/diag_chw_w64.py),
#   2. probe the w64 channels-major engine at 2K and 1080p (chw and
#      chw_int8 — int8 pays on the wide stages only the w64 net has),
#   3. the end-to-end EXR-in serving bench,
#   4. the deployment-net golden fixture generation (long).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# Persistent compile cache: the remote AOT compiles cost 20+ min at 2K
# shapes; cache hits make re-runs and session retries ~free.
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=logs/bench_r4e.jsonl
: > "$OUT"

run() {
  local name="$1" tmo="$2" rc; shift 2
  echo "=== $name: $* ===" >&2
  if timeout "$tmo" "$@" >> "$OUT" 2> "logs/${name}_r4e.err"; then
    echo "=== $name ok ===" >&2
  else
    rc=$?  # capture before anything else clobbers it (124 = timed out)
    echo "{\"item\": \"$name\", \"error\": \"exit $rc (see logs/${name}_r4e.err)\"}" >> "$OUT"
  fi
}

run diag_chw_w64_fixed 2400 python scripts/diag_chw_w64.py --timeout 600
run probe_w64_chw_2k 2400 python scripts/bench_probe.py --impl chw \
  --widths 64,128,512,1024 --height 1024 --width 2048
run probe_w64_chwint8_2k 2400 python scripts/bench_probe.py --impl chw_int8 \
  --widths 64,128,512,1024 --height 1024 --width 2048
run probe_w64_chwint8_1080p 2400 python scripts/bench_probe.py \
  --impl chw_int8 --widths 64,128,512,1024 --height 1088 --width 1920
run probe_w64_chw_1080p 2400 python scripts/bench_probe.py --impl chw \
  --widths 64,128,512,1024 --height 1088 --width 1920
# headline with the round-4 candidate set (w64 chw via killable probes,
# trimmed-2K latency + batch-2/4 throughput posture)
export PCSS_BENCH_PROBE_TIMEOUT=900
run bench_headline 5400 python bench.py
unset PCSS_BENCH_PROBE_TIMEOUT
run bench_serve 2400 python scripts/bench_serve.py
run make_deployment_golden 7200 python scripts/make_deployment_golden.py
echo "=== r4e session done ===" >&2
