"""bench.py budget discipline (VERDICT r4 weak #1).

The single most important property of bench.py is that the driver's run
COMPLETES with a parseable JSON line — even in the worst case where every
probe would hang.  These tests pin the cheap end of that guarantee: with
a deadline too small to afford any probe, the orchestrator must skip
everything via _BudgetExhausted and still print exactly one JSON line,
in seconds (no device, no compiles — the probes are never launched)."""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_extra, timeout=120):
    env = dict(os.environ, **env_extra)
    # keep the child off the TPU plugin: probes are budget-skipped anyway,
    # and the parent never initializes a backend
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "PJRT_LIBRARY_PATH"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          env=env, capture_output=True, text=True,
                          timeout=timeout)


def test_zero_budget_still_prints_json():
    # Frame overridden so it cannot match the committed last-good file:
    # with no stale value eligible, a zero-budget run must STILL print
    # one parseable line, with rc=1 (nothing measured, nothing reusable).
    t0 = time.monotonic()
    p = _run_bench({"PCSS_BENCH_SMOKE": "1", "PCSS_BENCH_DEADLINE_S": "31",
                    "PCSS_BENCH_H": "64", "PCSS_BENCH_W": "64"})
    elapsed = time.monotonic() - t0
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, p.stdout
    row = json.loads(lines[0])
    assert row["metric"] == "1080p_inference_frames_per_sec_per_chip"
    assert "value" in row and "vs_baseline" in row
    assert row["value"] == 0.0 and "stale_from_last_good" not in row
    # nothing could be measured inside a 31 s budget → rc signals failure
    # but the line is parseable (the driver records parsed + rc)
    assert p.returncode == 1
    # and it finished in seconds — every probe was skipped, not timed out
    assert elapsed < 60, elapsed
    assert "budget exhausted" in p.stderr or "failed" in p.stderr


def test_zero_budget_emits_stale_last_good():
    """Worst-case guarantee (VERDICT r4 next #1): when every probe fails
    but a same-frame last-good measurement is persisted, bench.py emits
    it — loudly marked stale — and exits 0 so the driver records a parsed
    line with real keys instead of a forfeited round."""
    lg_path = os.path.join(REPO, "logs", "bench_last_good.json")
    if not os.path.exists(lg_path):
        import pytest
        pytest.skip("no committed last-good file")
    with open(lg_path) as f:
        lg = json.load(f)
    w, h = lg["frame"].split("x")
    p = _run_bench({"PCSS_BENCH_SMOKE": "1", "PCSS_BENCH_DEADLINE_S": "31",
                    "PCSS_BENCH_H": h, "PCSS_BENCH_W": w})
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, p.stdout
    row = json.loads(lines[0])
    assert row["stale_from_last_good"] is True
    assert row["value"] == lg["value"] and row["value"] > 0
    assert "STALE" in row["note"]
    assert p.returncode == 0
    # the stale run must not have refreshed the last-good timestamp
    with open(lg_path) as f:
        assert json.load(f).get("measured_at") == lg.get("measured_at")


def test_unreachable_device_emits_stale_last_good(monkeypatch, capsys):
    """Tunnel-down worst case (observed 2026-08-20: the axon tunnel died
    mid-session and jax.devices() hung for hours): the driver run must
    still print parsed keys — the last persisted measurement, marked
    stale, with the unreachable error — and exit 0."""
    import pytest

    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setattr(bench, "_device_reachable", lambda: False)
    monkeypatch.delenv("PCSS_BENCH_SMOKE", raising=False)
    monkeypatch.setenv("PCSS_BENCH_DEADLINE_S", "45")
    with pytest.raises(SystemExit) as ei:
        bench.main()
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "unreachable" in row["error"]
    if os.path.exists(os.path.join(REPO, "logs", "bench_last_good.json")):
        assert row["stale_from_last_good"] is True and row["value"] > 0
        assert "STALE" in row["note"]
        assert ei.value.code == 0
    else:
        assert row["value"] == 0.0 and ei.value.code == 1


def test_probe_timeouts_sized_from_remaining_budget(monkeypatch):
    """probe() must never request more child time than the remaining
    budget (minus the emission margin), and must refuse to launch at all
    when too little is left."""
    sys.path.insert(0, REPO)
    import pytest

    import bench

    seen = {}

    class _FakeProc:
        returncode = 0
        stdout = '{"ms_per_frame": 1.0}\n'
        stderr = ""

    def fake_run(cmd, capture_output, text, timeout, env=None):
        seen["timeout"] = timeout
        seen["env"] = env
        return _FakeProc()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    # plenty of budget → the per-probe cap wins
    bench._T_END = time.monotonic() + 10_000.0
    bench.probe("plain", "stack", 1, 8, 8, None, bench.W16, cap_s=480)
    assert abs(seen["timeout"] - 480) < 1.0
    # probe children share the repo-local persistent compile cache even
    # when the caller (the driver) didn't export it (r5a cold-compile fix)
    assert seen["env"]["JAX_COMPILATION_CACHE_DIR"].endswith(".jax_cache")
    # 100 s left → a 10000 s cap is clamped to remaining − 15 s margin
    bench._T_END = time.monotonic() + 100.0
    bench.probe("plain", "stack", 1, 8, 8, None, bench.W16, cap_s=10_000)
    assert seen["timeout"] <= 85.5
    # under the 30 s floor → refuses to launch (callers skip, not overrun)
    bench._T_END = time.monotonic() + 40.0
    seen.clear()
    with pytest.raises(bench._BudgetExhausted):
        bench.probe("plain", "stack", 1, 8, 8, None, bench.W16, cap_s=600)
    assert not seen  # the child was never spawned
