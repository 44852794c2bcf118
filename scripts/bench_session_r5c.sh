#!/usr/bin/env bash
# Round-5c TPU session: quantify the MXU-banded layout movers (commit
# cb0ac29) born from r5b's stage breakdown (entry 3.14 ms of the 6.0 ms
# w16-2K frame): (1) per-stage A/B rows ([mxu]/[einsum] variants beside
# their XLA twins, plus WHOLE[xla] vs WHOLE[mxu]), (2) control probes
# with --movers xla on the SAME code, (3) int8-in-chw re-check now the
# layout floor is gone, (4) the batch-4 throughput posture, (5) a fresh
# headline on warm caches.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=logs/bench_r5c.jsonl
: > "$OUT"

run() {
  local name="$1" tmo="$2" rc; shift 2
  echo "=== $name: $* ===" >&2
  if timeout "$tmo" "$@" >> "$OUT" 2> "logs/${name}_r5c.err"; then
    echo "=== $name ok ===" >&2
  else
    rc=$?  # 124 = timed out; anything else = the child's real exit code
    local reason
    reason=$(grep -v '^WARNING' "logs/${name}_r5c.err" | grep -v '^$' | tail -1 | cut -c1-300 | tr '"' "'")
    echo "{\"item\": \"$name\", \"rc\": $rc, \"error\": \"$reason\", \"log\": \"logs/${name}_r5c.err\"}" >> "$OUT"
    echo "=== $name FAILED rc=$rc ===" >&2
  fi
}

# 1. per-stage A/B (separate log: stage rows are a different schema)
run bench_stages 4800 sh -c "python scripts/bench_chw_stages.py > logs/bench_stages_r5c.jsonl"

# 2. movers control: same code, XLA movers (isolates the delta)
run probe_w16_chw_2k_xla 2700 python scripts/bench_probe.py --impl chw \
  --movers xla --wide nhwc --widths 16,32,128,256 --height 1024 --width 2048

# 3. int8 inside the chw engine, layout floor removed
run probe_w16_chwint8_2k 2700 python scripts/bench_probe.py --impl chw_int8 \
  --widths 16,32,128,256 --height 1024 --width 2048

# 4. 2K throughput posture with the new engine
run probe_w16_chw_2k_b4 2700 python scripts/bench_probe.py --impl chw \
  --batch 4 --widths 16,32,128,256 --height 1024 --width 2048

# 5. 1080p with the new engine (in case r5b's probe predated cb0ac29)
run probe_w16_chw_1080p 2700 python scripts/bench_probe.py --impl chw \
  --widths 16,32,128,256 --height 1088 --width 1920

# 5b. mixed per-stage taps (r5b A/B: chunk128 wins dec_final only)
run probe_w16_chw_2k_mixedtaps 2700 python scripts/bench_probe.py --impl chw \
  --taps "dec_final=chunk128,*=stack" \
  --widths 16,32,128,256 --height 1024 --width 2048

# 6. w64 channels-major, movers rematch: the r5a measured-negative
#    (chw_int8 15.32 ms vs NHWC fused+int8 14.5 ms at 1080p) carried the
#    old XLA entry/pool/exit costs — the mxu movers remove exactly those,
#    so the posture verdict must be re-taken
run probe_w64_chwint8_1080p 2700 python scripts/bench_probe.py --impl chw_int8 \
  --widths 64,128,512,1024 --height 1088 --width 1920
run probe_w64_chwint8_2k 2700 python scripts/bench_probe.py --impl chw_int8 \
  --widths 64,128,512,1024 --height 1024 --width 2048

# 7. fresh headline on warm caches (refreshes bench_last_good.json)
run bench_headline 1500 python bench.py
echo "=== r5c session done ===" >&2
