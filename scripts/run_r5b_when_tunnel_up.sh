#!/usr/bin/env bash
# Tunnel-health gate for the r5b bench session (the axon tunnel dies
# unpredictably — 2026-08-20 it wedged mid-session with jax.devices()
# hanging).  Polls with a bounded device probe; when the tunnel answers,
# pauses the CPU golden generator (single-core machine: it would starve
# and contaminate the TPU measurements), runs the session, resumes it.
set -u
cd "$(dirname "$0")/.."
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
if [ -n "${GPID:-}" ] && kill -0 "$GPID" 2>/dev/null; then
  kill -STOP "$GPID" && echo "[gate] paused golden gen $GPID" >&2
fi
bash scripts/bench_session_r5b.sh > logs/session_r5b_driver.log 2>&1
rc=$?
if [ -n "${GPID:-}" ] && kill -0 "$GPID" 2>/dev/null; then
  kill -CONT "$GPID" && echo "[gate] resumed golden gen $GPID" >&2
fi
echo "[gate] session done rc=$rc $(date)" >&2
