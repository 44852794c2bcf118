#!/usr/bin/env bash
# Round-5e TPU session — the round's remaining asks, best-first, every
# item killable with per-item JSONL + .err capture:
#   1. trimmed w16 at paper-native 2K under the batched MXU movers
#      (VERDICT next-#4: the <=5.8 ms attempt)
#   2. deployment golden fixture, generated ON THE CHIP at full scale
#      (VERDICT next-#3; r5a's attempt died in a wedged remote compile —
#      retried here first thing while the tunnel is known-healthy)
#   3. headline w64 fused_int8 refresh under the MXU pixel shuffles
#      (also warms the shared compile cache for the driver's bench.py)
#   4. w64 channels-major rematch (r5a negative carried the old movers)
#   5. serving benchmark, full size (VERDICT next-#6; the r5a crash was
#      fixed in d023a2f — this is its first complete run)
#   6. per-stage mover A/B evidence rows
#   7. bench.py on warm caches (refreshes logs/bench_last_good.json)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=logs/bench_r5e.jsonl
: > "$OUT"

run() {
  local name="$1" tmo="$2" rc; shift 2
  echo "=== $name: $* ===" >&2
  if timeout "$tmo" "$@" >> "$OUT" 2> "logs/${name}_r5e.err"; then
    echo "=== $name ok ===" >&2
  else
    rc=$?  # 124 = timed out; anything else = the child's real exit code
    local reason
    reason=$(grep -v '^WARNING' "logs/${name}_r5e.err" | grep -v '^$' | tail -1 | cut -c1-300 | tr '"' "'")
    echo "{\"item\": \"$name\", \"rc\": $rc, \"error\": \"$reason\", \"log\": \"logs/${name}_r5e.err\"}" >> "$OUT"
    echo "=== $name FAILED rc=$rc ===" >&2
  fi
}

run probe_w16_chw_2k 2400 python scripts/bench_probe.py --impl chw \
  --widths 16,32,128,256 --height 1024 --width 2048

run golden_tpu 2400 python scripts/make_deployment_golden.py

run probe_w64_fusedint8_1080p 1200 python scripts/bench_probe.py \
  --impl fused_int8 --scan 32 --skip_flops \
  --widths 64,128,512,1024 --height 1088 --width 1920

run probe_w64_chwint8_1080p 1500 python scripts/bench_probe.py --impl chw_int8 \
  --widths 64,128,512,1024 --height 1088 --width 1920

run bench_serve 1800 python scripts/bench_serve.py

# w64 posture sweep: the BENCHMARKS.md posture table's plain/fused rows
# came from an unretained r4 sibling session — re-measure them so every
# row has a committed citable source (VERDICT next-#2)
run probe_w64_plain_1080p 900 python scripts/bench_probe.py \
  --impl plain --scan 32 --skip_flops \
  --widths 64,128,512,1024 --height 1088 --width 1920
run probe_w64_fused_1080p 900 python scripts/bench_probe.py \
  --impl fused --scan 32 --skip_flops \
  --widths 64,128,512,1024 --height 1088 --width 1920
run probe_w64_fused_accshift_1080p 600 python scripts/bench_probe.py \
  --impl fused --taps acc_shift --scan 32 --skip_flops \
  --widths 64,128,512,1024 --height 1088 --width 1920

run bench_stages 900 sh -c "python scripts/bench_chw_stages.py > logs/bench_stages_r5e.jsonl"

run bench_headline 1500 python bench.py
echo "=== r5e session done ===" >&2
