#!/usr/bin/env bash
# Round-5f TPU session — follow-ups to r5e's findings:
#   1. the r5e w64 fused_int8 row measured 16.08 ms vs r4c's 14.5 — the
#      only graph change was the MXU pixel-shuffle twins (aae86d8), now
#      gated per-net ("auto": wide nets keep the XLA reshape form).  This
#      probe re-runs the SAME posture under auto to confirm the policy
#      restores the 14.5 ms headline.
#   2. w16 1080p channels-major refresh (its 6.08 ms number predates the
#      MXU movers; 2K dropped 5.95 -> 3.12, expect a similar cut)
#   3. trimmed-2K chw_int8 re-verdict under the movers (the "int8 buys
#      the trimmed net nothing" verdict carried the old engine)
#   4. 2K batch-2 throughput posture under the movers
#   5. bench.py refresh (writes logs/bench_last_good.json)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=logs/bench_r5f.jsonl
: > "$OUT"

run() {
  local name="$1" tmo="$2" rc; shift 2
  echo "=== $name: $* ===" >&2
  if timeout "$tmo" "$@" >> "$OUT" 2> "logs/${name}_r5f.err"; then
    echo "=== $name ok ===" >&2
  else
    rc=$?  # 124 = timed out; anything else = the child's real exit code
    local reason
    reason=$(grep -v '^WARNING' "logs/${name}_r5f.err" | grep -v '^$' | tail -1 | cut -c1-300 | tr '"' "'")
    echo "{\"item\": \"$name\", \"rc\": $rc, \"error\": \"$reason\", \"log\": \"logs/${name}_r5f.err\"}" >> "$OUT"
    echo "=== $name FAILED rc=$rc ===" >&2
  fi
}

run probe_w64_fusedint8_auto 1200 python scripts/bench_probe.py \
  --impl fused_int8 --scan 32 --skip_flops \
  --widths 64,128,512,1024 --height 1088 --width 1920

run probe_w16_chw_1080p 1200 python scripts/bench_probe.py --impl chw \
  --widths 16,32,128,256 --height 1088 --width 1920

run probe_w16_chwint8_2k 1200 python scripts/bench_probe.py --impl chw_int8 \
  --widths 16,32,128,256 --height 1024 --width 2048

run probe_w16_chw_2k_b2 1200 python scripts/bench_probe.py --impl chw \
  --batch 2 --widths 16,32,128,256 --height 1024 --width 2048

# 2K posture rows for the BENCHMARKS.md table whose r4 sibling-session
# evidence was never retained (VERDICT next-#2): re-measure the cited
# configurations at the paper-native 2048x1024
run probe_w64_plain_2k 900 python scripts/bench_probe.py \
  --impl plain --scan 32 --skip_flops \
  --widths 64,128,512,1024 --height 1024 --width 2048
run probe_w64_fusedint8_2k 900 python scripts/bench_probe.py \
  --impl fused_int8 --scan 32 --skip_flops \
  --widths 64,128,512,1024 --height 1024 --width 2048
run probe_w16_plain_2k 600 python scripts/bench_probe.py \
  --impl plain --scan 32 --skip_flops \
  --widths 16,32,128,256 --height 1024 --width 2048
run probe_w16_fused_2k 600 python scripts/bench_probe.py \
  --impl fused --scan 32 --skip_flops \
  --widths 16,32,128,256 --height 1024 --width 2048
run probe_w16_fusedint8_2k 600 python scripts/bench_probe.py \
  --impl fused_int8 --scan 32 --skip_flops \
  --widths 16,32,128,256 --height 1024 --width 2048

run bench_headline 1500 python bench.py

# per-stage mover A/B, re-run with a cap sized for its ~2x-per-stage
# compiles (the r5e run died at 900 s after capturing entry: 3.23 ms
# XLA vs 0.136 ms MXU)
run bench_stages 1800 sh -c "python scripts/bench_chw_stages.py > logs/bench_stages_r5f.jsonl"

# banded-resize A/B on the w64 NHWC posture (the resize.py revert landed
# mid-session: probe_w64_fusedint8_auto above ran BANDED at 15.68 ms;
# this explicit re-run is the DENSE side — expect ~14.5)
run probe_w64_fusedint8_dense 1200 python scripts/bench_probe.py \
  --impl fused_int8 --scan 32 --skip_flops \
  --widths 64,128,512,1024 --height 1088 --width 1920
echo "=== r5f session done ===" >&2
