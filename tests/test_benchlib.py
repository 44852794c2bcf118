"""Canonical bench harness (utils/benchlib.py) plumbing tests.

The methodology itself (input-chained scan + two-point differencing) was
validated on real hardware — scripts/bench_harness_ab.py and
bench_harness_ab2.py; see the benchlib module docstring for the measured
table.  These tests pin the harness's *plumbing*: the chain reaches the
input, the estimate is finite/positive, and the noise fallback engages
instead of emitting clamped garbage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcss_unet_tpu.utils.benchlib import (forward_flops, make_stream,
                                          measure_ms_per_frame)


def _apply(v, x):
    # a stand-in "model": params scale the input, mean over pixels
    return jnp.tanh(x * v["params"]["w"] + v["params"]["b"])


PARAMS = {"w": jnp.float32(1.5), "b": jnp.float32(0.25)}


def test_measure_returns_finite_positive():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 8, 8, 4)).astype(np.float32))
    ms = measure_ms_per_frame(_apply, PARAMS, {}, x, scan_len=4, reps=2)
    assert np.isfinite(ms) and ms > 0


def test_chain_is_input_dependent():
    # the scan carry must feed the next iteration's INPUT: with a large
    # chain epsilon the accumulated result must differ from the
    # chain-free forward mean, proving the dependency is real (nothing
    # for LICM to hoist).
    x = jnp.ones((1, 4, 4, 4), jnp.float32)
    stream, leaves = make_stream(_apply, PARAMS, {}, scan_len=3)
    chained = float(stream(leaves, {}, x))
    single = float(jnp.mean(_apply({"params": PARAMS}, x)))
    # iteration 1 sees x, iterations 2-3 see x + carry*1e-12 — at f32 the
    # perturbation is sub-ulp by design, so results agree to fp noise...
    assert chained == pytest.approx(single, abs=1e-6)
    # ...but the jaxpr must actually thread the carry into the input add
    jaxpr = jax.make_jaxpr(
        lambda lv, x: stream.__wrapped__(lv, {}, x))(leaves, x)
    assert "scan" in str(jaxpr)


def test_noise_fallback_is_sane():
    # at trivially small shapes the two-point difference sits below
    # dispatch noise; the harness must fall back to the single-dispatch
    # bound, never emit the clamped ~1e-9 garbage (32e9 "fps")
    x = jnp.ones((1, 2, 2, 1), jnp.float32)
    ms = measure_ms_per_frame(_apply, PARAMS, {}, x, scan_len=2, reps=2)
    assert 1e-6 < ms < 1e5


def test_forward_flops_best_effort():
    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    fl = forward_flops(_apply, PARAMS, {}, x)
    assert fl is None or fl > 0
