#!/usr/bin/env bash
# Round-4 canonical bench session: headline, 2K sweep, chw A/B — with the
# hardware-validated two-point-differencing harness.  Streams per-item
# results and tolerates per-item failure (VERDICT r3 weak #2 discipline).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=logs/bench_r4b.jsonl
: > "$OUT"

run() {
  local name="$1"; shift
  echo "=== $name: $* ===" >&2
  if timeout 4500 "$@" >> "$OUT" 2> "logs/${name}_r4b.err"; then
    echo "=== $name ok ===" >&2
  else
    echo "{\"item\": \"$name\", \"error\": \"exit $? (see logs/${name}_r4b.err)\"}" >> "$OUT"
  fi
}

run bench_headline python bench.py
run bench_2k python scripts/bench_2k.py
run bench_chw python scripts/bench_chw.py
echo "=== session done ===" >&2
