#!/usr/bin/env bash
# Round-5a TPU session, ordered most-valuable-first, per-item isolated.
# Targets (VERDICT r4 "next round"): #5 measure the w64 channels-major
# posture (1080p + 2K), #6 run the serving benchmark, #3 generate the
# deployment golden fixture, #2 re-measure the accum-4 reference-scale
# training row, then a full bench.py headline against the warmed cache.
#
# rc capture: plain `if timeout ...; then ... else rc=$?` — the else
# branch sees timeout(1)'s real status (124 = timed out), unlike r4d's
# `if ! timeout` pattern whose rc=$? was the negation (always 0).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# Persistent compile cache: remote AOT compiles cost up to ~20 min at 2K
# shapes; cache hits make re-runs and session retries ~free.
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
OUT=logs/bench_r5a.jsonl
: > "$OUT"

run() {
  local name="$1" tmo="$2" rc; shift 2
  echo "=== $name: $* ===" >&2
  if timeout "$tmo" "$@" >> "$OUT" 2> "logs/${name}_r5a.err"; then
    echo "=== $name ok ===" >&2
  else
    rc=$?  # 124 = timed out; anything else = the child's real exit code
    local reason
    reason=$(grep -v '^WARNING' "logs/${name}_r5a.err" | grep -v '^$' | tail -1 | cut -c1-300 | tr '"' "'")
    echo "{\"item\": \"$name\", \"rc\": $rc, \"error\": \"$reason\", \"log\": \"logs/${name}_r5a.err\"}" >> "$OUT"
    echo "=== $name FAILED rc=$rc ===" >&2
  fi
}

# 1. w64 channels-major posture (VERDICT #5): headline-relevant 1080p
#    first, then the 2K points.  int8 first — it pays on the wide stages
#    only the w64 net has, so it is the likelier winner.
run probe_w64_chwint8_1080p 2400 python scripts/bench_probe.py \
  --impl chw_int8 --widths 64,128,512,1024 --height 1088 --width 1920
run probe_w64_chw_1080p 2400 python scripts/bench_probe.py --impl chw \
  --widths 64,128,512,1024 --height 1088 --width 1920
run probe_w64_chwint8_2k 2400 python scripts/bench_probe.py --impl chw_int8 \
  --widths 64,128,512,1024 --height 1024 --width 2048
run probe_w64_chw_2k 2400 python scripts/bench_probe.py --impl chw \
  --widths 64,128,512,1024 --height 1024 --width 2048

# 2. serving benchmark (VERDICT #6): EXR-in e2e, deployment posture
run bench_serve 2400 python scripts/bench_serve.py

# 3. deployment golden fixture (VERDICT #3): train teacher, distill w16
#    student, freeze weights + deployment-posture quality
run make_deployment_golden 7200 python scripts/make_deployment_golden.py

# 4. re-measure the accum-4 reference-scale training row (VERDICT #2)
run train_2k_b8_accum4 3300 python scripts/bench_train.py --only 2k_b8_accum4_standard

# 5. full headline bench with the new global-deadline logic, against the
#    cache this session just warmed — also produces logs/bench_last_good.json
run bench_headline 1500 python bench.py
echo "=== r5a session done ===" >&2
