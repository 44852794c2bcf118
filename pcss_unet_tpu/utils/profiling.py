"""Tracing and per-layer latency analysis.

The reference has no profiling code; the paper reports a per-layer timing
analysis (paper.md:139-147) with no shipped implementation (SURVEY.md §5).
This module provides both TPU-native options:

- ``trace(logdir)``: jax.profiler context — open the trace in
  TensorBoard/Perfetto.
- ``layer_latency_report(model, variables, shape)``: compiled-cost and
  measured-latency breakdown per encoder/decoder block, by running prefix
  submodels (bound-module calls) under jit.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _timed(fn, *args, iters: int = 3) -> float:
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def compiled_flops(fn, *args) -> float | None:
    """XLA's own FLOP estimate for the compiled computation."""
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:  # noqa: BLE001 - cost analysis is backend-optional
        return None


def layer_latency_report(model, variables: dict, input_shape=(1, 1088, 1920, 4),
                         dtype=jnp.float32) -> list[dict[str, Any]]:
    """Per-block latency breakdown (paper.md:139-147 analysis, now runnable):
    each encoder/decoder ConvBlock is timed standalone at the spatial size it
    sees inside the network, plus the full model."""
    from pcss_unet_tpu.models.unet import ConvBlock

    n, h, w, c = input_shape
    h2, w2 = h // 2, w // 2
    widths = list(model.encoder_widths)
    report: list[dict[str, Any]] = []
    key = jax.random.PRNGKey(0)

    def time_block(name, in_ch, out_ch, hh, ww):
        block = ConvBlock(features=out_ch, dropout_rate=0.0,
                          activation=model.activation,
                          normalization=model.normalization, dtype=dtype)
        xx = jnp.zeros((n, hh, ww, in_ch), dtype)
        v = block.init({"params": key}, xx, False)
        fn = jax.jit(lambda vv, z: block.apply(vv, z, False))
        t = _timed(fn, v, xx)
        report.append({"stage": name, "seconds": t,
                       "shape": (n, hh, ww, in_ch), "out_ch": out_ch})

    hh, ww = h2, w2
    in_ch = model.in_ch * 4
    for i, width in enumerate(widths):
        time_block(f"enc_{i}", in_ch, width, hh, ww)
        in_ch = width
        if i < len(widths) - 1:
            hh, ww = hh // 2, ww // 2
    skips = widths[:-1]
    for i, skip_w in enumerate(reversed(skips)):
        hh, ww = hh * 2, ww * 2
        time_block(f"dec_{i}", in_ch, skip_w, hh, ww)
        in_ch = skip_w
    time_block("dec_final", in_ch, model.in_ch * 4, h2, w2)

    full = jax.jit(lambda v, xx: model.apply(v, xx, False))
    x = jnp.zeros(input_shape, dtype)
    t_full = _timed(full, variables, x)
    flops = compiled_flops(lambda v, xx: model.apply(v, xx, False),
                           variables, x)
    report.append({"stage": "full_model", "seconds": t_full, "flops": flops})
    return report
