"""XLA compile-probe memory governor (train/governor.py).

The analytic estimator is only the pre-screen; these tests pin the probe's
plumbing (compile-only, structure-true step) and the candidate walk that
picks the smallest accumulation split whose compiled plan fits.
"""

import numpy as np
import jax.numpy as jnp

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.train.governor import (
    find_accum_steps_compiled, probe_step_memory,
)

MEANS = np.zeros(4, np.float32)
STDS = np.ones(4, np.float32)


def _cfg(**kw):
    return Config(num_epochs=4, warmup_epochs=1, normalization="none",
                  dropout_rate=0.0, alpha=1.0, **kw)


def test_probe_returns_plan_or_none():
    """Compile-only probe on the host backend: either a coherent plan or a
    clean None (backend without memory_analysis) — never a crash."""
    cfg = _cfg(grad_accum_steps=1)
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                 normalization="none", dropout_rate=0.0)
    plan = probe_step_memory(cfg, model, MEANS, STDS, 2, 64, 64)
    if plan is not None:
        assert plan["total"] >= plan["temp"] >= 0
        assert plan["total"] >= plan["args"] > 0


def test_probe_scales_with_microbatch():
    """More accumulation → smaller microbatch → smaller temp plan."""
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                 normalization="none", dropout_rate=0.0)
    p1 = probe_step_memory(_cfg(grad_accum_steps=1), model, MEANS, STDS,
                           4, 128, 128)
    p4 = probe_step_memory(_cfg(grad_accum_steps=4), model, MEANS, STDS,
                           4, 128, 128)
    if p1 is None or p4 is None:
        import pytest

        pytest.skip("backend exposes no memory_analysis")
    assert p4["temp"] < p1["temp"]


def test_find_accum_walk_picks_smallest_fitting():
    """The walk returns the first divisor whose (fake) plan fits, honors
    ``start``, and subtracts the cache reserve from the budget."""
    calls = []

    def fake_probe(cfg, model, means, stds, batch, h, w):
        calls.append(cfg.grad_accum_steps)
        # plan shrinks with accumulation: microbatch activations dominate
        mb = batch // cfg.grad_accum_steps
        total = mb * (1 << 30)
        return {"total": total, "args": 1 << 28, "temp": total - (1 << 28),
                "out": 0}

    cfg = _cfg(grad_accum_steps=0)
    a = find_accum_steps_compiled(cfg, None, MEANS, STDS, 8, 64, 64,
                                  hbm_bytes=16 << 30, reserve_bytes=0,
                                  safety=1.15, probe=fake_probe)
    # microbatch 8 → 8 GiB·1.15 = 9.2 ≤ 16 → accum 1 fits immediately
    assert a == 1 and calls == [1]

    calls.clear()
    a = find_accum_steps_compiled(cfg, None, MEANS, STDS, 8, 64, 64,
                                  hbm_bytes=8 << 30,
                                  reserve_bytes=4 << 30,  # cache pressure
                                  safety=1.15, probe=fake_probe)
    # budget 4 GiB → microbatch must be ≤ 3.47 GiB → accum 4 (mb 2)
    assert a == 4 and calls == [1, 2, 4]

    calls.clear()
    a = find_accum_steps_compiled(cfg, None, MEANS, STDS, 8, 64, 64,
                                  hbm_bytes=8 << 30, start=4,
                                  safety=1.15, probe=fake_probe)
    assert a == 4 and calls == [4]  # analytic start skips ruled-out splits


def test_find_accum_walk_handles_probe_failure():
    """All probes failing → None (caller keeps the analytic answer); no
    divisor fitting → the largest split, loudly."""
    assert find_accum_steps_compiled(
        _cfg(grad_accum_steps=0), None, MEANS, STDS, 4, 64, 64,
        hbm_bytes=16 << 30, probe=lambda *a, **k: None) is None

    huge = {"total": 64 << 30, "args": 1 << 30, "temp": 63 << 30, "out": 0}
    assert find_accum_steps_compiled(
        _cfg(grad_accum_steps=0), None, MEANS, STDS, 4, 64, 64,
        hbm_bytes=16 << 30, probe=lambda *a, **k: dict(huge)) == 4
