"""Memory governor: analytic HBM estimation + live device stats.

Reference: analytic VRAM estimator (params×2 + optimizer state + 18×
activation factor + fixed overhead, main.py:666-780), a free-memory check
with a 1.2× buffer (main.py:720-764), and a doubling search for batch size
(main.py:766-780, whose result the reference then ignores —
SURVEY.md §2 'Memory governor' row).  The TPU version estimates against
HBM and the result is actually *used* by the CLI when batch_size=0 (auto).
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import numpy as np

HBM_BYTES_DEFAULT = 16 * 1024 ** 3  # v5e: 16 GiB/chip


def param_count(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def estimate_memory_usage(n_params: int, batch_size: int, height: int,
                          width: int, in_ch: int = 4,
                          optimizer: str = "adamw",
                          compute_bytes: int = 2,
                          activation_factor: float | None = None,
                          overhead_bytes: int = 512 * 1024 ** 2) -> dict:
    """Analytic bytes estimate (structure mirrors main.py:697-712: params,
    gradients, optimizer state, activation factor, fixed overhead).

    Calibration (round 4): the reference's flat ``18x input`` activation
    model underestimated XLA's real static plans by ~7-20x — measured
    against compiled-step ``memory_analysis()`` on the chip
    (logs/bench_train_r4.jsonl): 256²b8 → 130x, 1080p b1 → 167x, 2K
    microbatch-2 → ~350x.  The default factor is now shape-aware and
    deliberately CONSERVATIVE (over-estimates the small shapes) —
    ``170 + 45·(pixels·batch / 1M)`` covers all three calibration points
    from above.  This model remains only the fast pre-screen; the
    authoritative check is the XLA compile-probe (train/governor.py),
    which reads the compiler's own plan for the real step.
    """
    param_bytes = n_params * 4                      # fp32 master params
    grad_bytes = n_params * 4
    opt_slots = {"adam": 2, "adamw": 2, "sgd": 1}.get(optimizer, 2)
    opt_bytes = n_params * 4 * opt_slots
    input_bytes = batch_size * height * width * in_ch * compute_bytes
    if activation_factor is None:
        activation_factor = 170.0 + 45.0 * (
            batch_size * height * width / 1e6)
    activation_bytes = int(input_bytes * activation_factor)
    total = (param_bytes + grad_bytes + opt_bytes + activation_bytes
             + overhead_bytes)
    return {"params": param_bytes, "grads": grad_bytes, "optimizer": opt_bytes,
            "activations": activation_bytes, "overhead": overhead_bytes,
            "total": total}


def device_memory_stats(device=None) -> dict | None:
    """Live HBM stats when the backend exposes them (TPU does)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {"bytes_in_use": stats.get("bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use")}


def check_memory(n_params: int, batch_size: int, height: int, width: int,
                 optimizer: str = "adamw", safety_factor: float = 1.2,
                 hbm_bytes: int | None = None) -> bool:
    """Does the estimated working set fit HBM with a 1.2× buffer?
    (main.py:720-764 role)."""
    est = estimate_memory_usage(n_params, batch_size, height, width,
                                optimizer=optimizer)
    if hbm_bytes is None:
        stats = device_memory_stats()
        hbm_bytes = (stats or {}).get("bytes_limit") or HBM_BYTES_DEFAULT
    fits = est["total"] * safety_factor <= hbm_bytes
    logging.info("memory estimate: %.2f GiB of %.2f GiB HBM (batch %d) → %s",
                 est["total"] / 2 ** 30, hbm_bytes / 2 ** 30, batch_size,
                 "OK" if fits else "TOO LARGE")
    return fits


def find_accum_steps(n_params: int, batch_size: int, height: int,
                     width: int, optimizer: str = "adamw",
                     hbm_bytes: int | None = None) -> int:
    """Smallest divisor A of ``batch_size`` whose microbatch (batch/A) fits
    HBM — the gradient-accumulation auto-selector (cfg.grad_accum_steps=0).
    Under accumulation only the per-microbatch activations are live, so the
    check runs on the microbatch.  Returns ``batch_size`` (microbatch 1)
    when even that estimate exceeds HBM — the caller warns, XLA gets the
    final say."""
    for a in range(1, batch_size + 1):
        if batch_size % a:
            continue
        if check_memory(n_params, batch_size // a, height, width, optimizer,
                        hbm_bytes=hbm_bytes):
            return a
    return batch_size


def find_optimal_batch_size(n_params: int, height: int, width: int,
                            optimizer: str = "adamw", start: int = 1,
                            max_batch: int = 256,
                            hbm_bytes: int | None = None) -> int:
    """Largest power-of-two batch that fits (main.py:766-780 role — but the
    result is actually used here)."""
    batch = start
    best = start
    while batch <= max_batch:
        if check_memory(n_params, batch, height, width, optimizer,
                        hbm_bytes=hbm_bytes):
            best = batch
            batch *= 2
        else:
            break
    return best
