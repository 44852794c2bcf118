#!/usr/bin/env bash
# Round-5d TPU session (lean, deadline-aware replacement for r5c): the
# four measurements that matter most for the round, best-first.  The
# first mxu-mover whole-net graphs exceeded a 1800 s compile (r5b
# probe_w16_chw_2k rc=124) because the movers emitted ~140 block
# einsums; the batched one-hot rewrite collapses them to one dot per
# mover, and probe timeouts here are sized for a cold 2700 s compile
# anyway.  Per-item JSONL; every probe is killable.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=logs/bench_r5d.jsonl
: > "$OUT"

run() {
  local name="$1" tmo="$2" rc; shift 2
  echo "=== $name: $* ===" >&2
  if timeout "$tmo" "$@" >> "$OUT" 2> "logs/${name}_r5d.err"; then
    echo "=== $name ok ===" >&2
  else
    rc=$?  # 124 = timed out; anything else = the child's real exit code
    local reason
    reason=$(grep -v '^WARNING' "logs/${name}_r5d.err" | grep -v '^$' | tail -1 | cut -c1-300 | tr '"' "'")
    echo "{\"item\": \"$name\", \"rc\": $rc, \"error\": \"$reason\", \"log\": \"logs/${name}_r5d.err\"}" >> "$OUT"
    echo "=== $name FAILED rc=$rc ===" >&2
  fi
}

# 1. THE claim: trimmed w16 at paper-native 2K, MXU movers (batched)
run probe_w16_chw_2k 2700 python scripts/bench_probe.py --impl chw \
  --widths 16,32,128,256 --height 1024 --width 2048

# 2. bench.py's winner graph, refreshed under the MXU pixel shuffles
#    (same scan-32 configuration bench.py's step-1 probe compiles)
run probe_w64_fusedint8_1080p 1500 python scripts/bench_probe.py \
  --impl fused_int8 --scan 32 --skip_flops \
  --widths 64,128,512,1024 --height 1088 --width 1920

# 3. w64 channels-major rematch (r5a negative carried the old movers)
run probe_w64_chwint8_1080p 2700 python scripts/bench_probe.py --impl chw_int8 \
  --widths 64,128,512,1024 --height 1088 --width 1920

# 4. per-stage mover A/B evidence rows
run bench_stages 3600 sh -c "python scripts/bench_chw_stages.py > logs/bench_stages_r5d.jsonl"

# 5. final headline on warm caches (refreshes bench_last_good.json)
run bench_headline 1500 python bench.py
echo "=== r5d session done ===" >&2
