#!/usr/bin/env bash
# Round-5b TPU session: (1) per-stage breakdown of the w16 2K forward —
# the datum that picks the next optimization lever, (2) re-measure the
# trimmed-net chw numbers with the round-5 kernel epilogue fusions
# (in-kernel pad re-zeroing + fused skip-adds), (3) the serving bench
# (fixed write_exr call), (4) re-measure the 2K posture table rows whose
# round-4 evidence log was lost, (5) a fresh bench.py headline.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=logs/bench_r5b.jsonl
: > "$OUT"

run() {
  local name="$1" tmo="$2" rc; shift 2
  echo "=== $name: $* ===" >&2
  if timeout "$tmo" "$@" >> "$OUT" 2> "logs/${name}_r5b.err"; then
    echo "=== $name ok ===" >&2
  else
    rc=$?  # 124 = timed out; anything else = the child's real exit code
    local reason
    reason=$(grep -v '^WARNING' "logs/${name}_r5b.err" | grep -v '^$' | tail -1 | cut -c1-300 | tr '"' "'")
    echo "{\"item\": \"$name\", \"rc\": $rc, \"error\": \"$reason\", \"log\": \"logs/${name}_r5b.err\"}" >> "$OUT"
    echo "=== $name FAILED rc=$rc ===" >&2
  fi
}

# 1. per-stage breakdown (separate log: stage rows are a different schema)
run bench_stages 3600 sh -c "python scripts/bench_chw_stages.py > logs/bench_stages_r5b.jsonl"

# 1b. tap-strategy A/B on the N-stream-bound stages (rowpack = the
#     M-packing candidate; whole-forward per strategy included)
run bench_taps 4800 sh -c "python scripts/bench_taps.py --strategies stack,chunk128,rowpack >> logs/bench_stages_r5b.jsonl"

# 2. trimmed net with the new epilogue-fused engine
run probe_w16_chw_2k 1800 python scripts/bench_probe.py --impl chw \
  --widths 16,32,128,256 --height 1024 --width 2048
run probe_w16_chw_1080p 1800 python scripts/bench_probe.py --impl chw \
  --widths 16,32,128,256 --height 1088 --width 1920

# 3. serving benchmark (EXR-in e2e, deployment posture)
run bench_serve 2400 python scripts/bench_serve.py

# 4. 2K posture table re-measurements (round-4 evidence log lost)
run probe_w64_plain_2k 1800 python scripts/bench_probe.py --impl plain \
  --widths 64,128,512,1024 --height 1024 --width 2048
run probe_w64_fused_2k 1800 python scripts/bench_probe.py --impl fused \
  --widths 64,128,512,1024 --height 1024 --width 2048
run probe_w64_fusedint8_2k 1800 python scripts/bench_probe.py --impl fused_int8 \
  --widths 64,128,512,1024 --height 1024 --width 2048
run probe_w16_plain_2k 1800 python scripts/bench_probe.py --impl plain \
  --widths 16,32,128,256 --height 1024 --width 2048
run probe_w16_fused_2k 1800 python scripts/bench_probe.py --impl fused \
  --widths 16,32,128,256 --height 1024 --width 2048
run probe_w16_fusedint8_2k 1800 python scripts/bench_probe.py --impl fused_int8 \
  --widths 16,32,128,256 --height 1024 --width 2048

# 5. fresh headline with the new code (also refreshes bench_last_good.json)
run bench_headline 1500 python bench.py
echo "=== r5b session done ===" >&2
