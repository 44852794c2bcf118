#!/usr/bin/env bash
# Round-4c TPU session: probe-isolated headline bench, the w64 chw wedge
# diagnosis (each unit in a killable child — the r4b session lost 75 min
# to a wedged w64 chw compile), a w16 chw_int8 2K probe, the end-to-end
# serving bench, and the deployment-net golden fixture generation.
# Streams results per item and tolerates per-item failure.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=logs/bench_r4c.jsonl
: > "$OUT"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name: $* ===" >&2
  if timeout "$tmo" "$@" >> "$OUT" 2> "logs/${name}_r4c.err"; then
    echo "=== $name ok ===" >&2
  else
    echo "{\"item\": \"$name\", \"error\": \"exit $? (see logs/${name}_r4c.err)\"}" >> "$OUT"
  fi
}

run bench_headline 5400 python bench.py
run probe_w16_chwint8_2k 1500 python scripts/bench_probe.py --impl chw_int8 \
  --widths 16,32,128,256 --height 1024 --width 2048
run diag_chw_w64 2000 python scripts/diag_chw_w64.py --timeout 300
run bench_serve 2400 python scripts/bench_serve.py
run make_deployment_golden 7200 python scripts/make_deployment_golden.py
echo "=== session done ===" >&2
