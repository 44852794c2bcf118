#!/bin/sh
# One-shot TPU measurement session (run when the tunnel is up).
# Hardened (VERDICT r3 next-#2): PYTHONPATH exported, every item tolerates
# failure (a dying item logs an error record and the session continues),
# output streams to the JSONL as each line lands (a dying tunnel forfeits
# only the in-flight item), and the items are ordered most-valuable-first
# with the never-yet-measured reference-scale training sweep ahead of the
# tap A/Bs that already have numbers:
#   1. bench.py headline (self-selects tap strategy; refreshes last-good)
#   2. training throughput incl. reference-scale 2K batch-8 accum sweep
#      (VERDICT r3 next-#1 — the reference's actual workload)
#   3. 2K sweep: full + trimmed nets, all postures/taps (BASELINE.md row 1)
#   4. per-stage kernel A/B (plain taps / stack_taps / acc_shift)
#   5. small-channel floor discrimination
# Writes JSON lines to logs/taps_tpu_$(date +%s).jsonl
cd "$(dirname "$0")/.." || exit 1
PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export PYTHONPATH
OUT="logs/taps_tpu_$(date +%s).jsonl"
mkdir -p logs

run_item() {
    # run_item <name> <timeout_s> <cmd...>
    name="$1"; tmo="$2"; shift 2
    echo "== $name ==" | tee -a "$OUT"
    if timeout "$tmo" "$@" | tee -a "$OUT"; then
        :
    else
        rc=$?
        printf '{"item": "%s", "error": "exit %s (timeout %ss)"}\n' \
            "$name" "$rc" "$tmo" | tee -a "$OUT"
    fi
}

run_item "bench.py headline" 2400 python bench.py
run_item "training throughput (reference-scale 2K accum sweep)" 3000 \
    python scripts/bench_train.py
run_item "2K sweep (full + trimmed, all postures/taps)" 2400 \
    python scripts/bench_2k.py
run_item "per-stage kernel A/B" 1200 python scripts/bench_convblock.py
run_item "small-channel floor discrimination" 1200 python scripts/bench_floor.py
echo "wrote $OUT"
