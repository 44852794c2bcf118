#!/usr/bin/env bash
# Generic gated TPU-session launcher: optionally waits for a predecessor
# PID, then for tunnel health (bounded device probe — the axon tunnel
# dies unpredictably and jax.devices() can hang for hours), pauses the
# CPU golden generator for measurement purity (single-core machine),
# runs the given session script, resumes the generator.
#   usage: run_session_gated.sh <session-script> <driver-log> [wait-pid]
set -u
cd "$(dirname "$0")/.."
SESSION="$1"; DRIVER_LOG="$2"; WAIT_PID="${3:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[gate] waiting for predecessor pid $WAIT_PID $(date)" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "[gate] waiting for tunnel health $(date)" >&2
while true; do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[gate] tunnel healthy $(date)" >&2
    break
  fi
  echo "[gate] tunnel still down $(date)" >&2
  sleep 240
done
GPID=$(cat /tmp/golden_cpu.pid 2>/dev/null || true)
# PCSS_GATE_NOPAUSE=1 leaves the golden generator running (nice-19):
# the canonical two-point scan-differencing harness is dispatch-
# overhead-immune, and near a round deadline the generator's wall
# clock matters more than pristine isolation.
if [ "${PCSS_GATE_NOPAUSE:-0}" != "1" ] \
    && [ -n "${GPID:-}" ] && kill -0 "$GPID" 2>/dev/null; then
  kill -STOP "$GPID" && echo "[gate] paused golden gen $GPID" >&2
fi
bash "$SESSION" > "$DRIVER_LOG" 2>&1
rc=$?
if [ -n "${GPID:-}" ] && kill -0 "$GPID" 2>/dev/null; then
  kill -CONT "$GPID" && echo "[gate] resumed golden gen $GPID" >&2
fi
echo "[gate] session $SESSION done rc=$rc $(date)" >&2
