"""XLA compile-probe memory governor.

The analytic estimator (utils/memory.py, mirroring the reference's
main.py:666-780 VRAM arithmetic) is a guess; XLA's static memory plan for
the *compiled train step* is ground truth by construction.  The round-4
reference-scale sweep (logs/bench_train_r4.jsonl) showed the analytic
model underestimating ~9x at 2048x1024 (est 1.3 GiB vs XLA 12.3 GiB) —
enough that auto-accumulation picked microbatches that RESOURCE_EXHAUSTED
on the chip.

The TPU-native fix: *ask the compiler*.  ``probe_step_memory`` builds the
real jitted train step (same ``build_train_step`` the loop runs, same
loss_type / perturbation / distillation structure), lowers it on abstract
``ShapeDtypeStruct`` batches — so nothing frame-sized is ever allocated —
compiles, and reads ``memory_analysis()``.  ``find_accum_steps_compiled``
walks candidate accumulation splits from the analytic guess upward until
XLA's plan (plus a reserve for the HBM-resident dataset cache) fits.  The
winning candidate's executable is exactly the one the training loop will
ask XLA for, so its compile time is not wasted — the jit cache serves it.

Reference contract: main.py:720-780 (fit-check with a safety buffer and a
search whose result is actually used here — SURVEY.md §2 'Memory
governor').
"""

from __future__ import annotations

import logging
from typing import Callable

import jax
import numpy as np

from pcss_unet_tpu.utils.memory import HBM_BYTES_DEFAULT, device_memory_stats


def _plan_bytes(ma) -> int | None:
    """Total static-plan bytes from a ``memory_analysis()`` result."""
    try:
        return int(ma.argument_size_in_bytes + ma.output_size_in_bytes
                   + ma.temp_size_in_bytes)
    except AttributeError:
        return None


def probe_step_memory(cfg, model, means, stds, batch: int, h: int, w: int,
                      steps_per_epoch: int = 100) -> dict | None:
    """XLA's static memory plan for ONE compiled train step at this config.

    Compile-only: the batch is abstract (ShapeDtypeStruct) and the step is
    never executed, so the probe allocates no activation HBM.  Returns
    ``{"total": bytes, "args": ..., "temp": ..., "out": ...}`` or None when
    the backend exposes no memory analysis / compilation fails.
    """
    import jax.numpy as jnp

    from pcss_unet_tpu.losses import LossBundle, PerceptualLoss
    from pcss_unet_tpu.train.state import create_train_state
    from pcss_unet_tpu.train.step import build_train_step

    try:
        state = create_train_state(model, cfg, steps_per_epoch,
                                   (1, 64, 64, cfg.input_channels))
        # structure-true bundle: seeded-random VGG has the reference
        # architecture's exact shapes, so the plan is the real plan even
        # without the weights artifact on disk
        bundle = LossBundle(perceptual=PerceptualLoss(None),
                            alpha=cfg.alpha,
                            perturb_weight=cfg.perturb_weight,
                            perturbation_count=cfg.perturbation_count,
                            high_freq_weight=cfg.high_freq_weight,
                            penumbra_weight=cfg.penumbra_weight,
                            sobel_weight=cfg.sobel_weight,
                            ssim_weight=cfg.ssim_weight)
        teacher = None
        if getattr(cfg, "distill_teacher", ""):
            # memory shape of distillation = one eval forward of the
            # teacher architecture; random init has identical footprint
            from pcss_unet_tpu.models import unet_from_config

            t_model = unet_from_config(cfg.replace(
                model_depth=cfg.distill_teacher_depth,
                base_width=cfg.distill_teacher_width))
            key = jax.random.PRNGKey(0)
            t_vars = t_model.init({"params": key, "dropout": key},
                                  jnp.zeros((1, 64, 64, cfg.input_channels),
                                            jnp.float32), False)
            teacher = (t_model, t_vars)
        step = jax.jit(build_train_step(cfg, bundle,
                                        np.asarray(means, np.float32),
                                        np.asarray(stds, np.float32),
                                        steps_per_epoch, teacher=teacher),
                       donate_argnums=(0,))
        x = jax.ShapeDtypeStruct((batch, h, w, cfg.input_channels),
                                 jnp.float32)
        y = jax.ShapeDtypeStruct((batch, h, w, 1), jnp.float32)
        key_sds = jax.ShapeDtypeStruct((2,), jnp.uint32)
        ma = step.lower(state, x, y, key_sds).compile().memory_analysis()
        if ma is None:
            return None
        total = _plan_bytes(ma)
        if total is None:
            return None
        return {"total": total,
                "args": int(ma.argument_size_in_bytes),
                "temp": int(ma.temp_size_in_bytes),
                "out": int(ma.output_size_in_bytes)}
    except Exception as e:  # noqa: BLE001 — probe is best-effort by design
        logging.info("XLA memory probe failed (%s); analytic estimate "
                     "stays authoritative", e)
        return None


def find_accum_steps_compiled(cfg, model, means, stds, per_chip_batch: int,
                              h: int, w: int, *,
                              hbm_bytes: int | None = None,
                              reserve_bytes: int = 0,
                              safety: float = 1.15,
                              start: int = 1,
                              probe: Callable | None = None) -> int | None:
    """Smallest divisor A of ``per_chip_batch`` whose compiled step plan
    fits ``hbm_bytes - reserve_bytes`` with a ``safety`` buffer.

    ``start``: first candidate (pass the analytic suggestion to skip
    candidates the cheap model already rules out — the analytic model only
    ever *under*-estimates in our calibration, so candidates below its
    answer cannot fit).  ``reserve_bytes``: HBM the step must coexist with
    (the device dataset cache).  Returns None when no candidate's probe
    succeeds (caller falls back to analytic).
    """
    if hbm_bytes is None:
        stats = device_memory_stats()
        hbm_bytes = (stats or {}).get("bytes_limit") or HBM_BYTES_DEFAULT
    budget = hbm_bytes - reserve_bytes
    probe = probe or probe_step_memory
    probed_any = False
    last = None
    for a in range(max(1, start), per_chip_batch + 1):
        if per_chip_batch % a:
            continue
        plan = probe(cfg.replace(grad_accum_steps=a), model, means, stds,
                     per_chip_batch, h, w)
        if plan is None:
            continue
        probed_any = True
        last = a
        fits = plan["total"] * safety <= budget
        logging.info("XLA plan @accum=%d (microbatch %d): %.2f GiB "
                     "(args %.2f + temp %.2f) vs %.2f GiB budget → %s",
                     a, per_chip_batch // a, plan["total"] / 2 ** 30,
                     plan["args"] / 2 ** 30, plan["temp"] / 2 ** 30,
                     budget / 2 ** 30, "OK" if fits else "too large")
        if fits:
            return a
    if probed_any:
        # every divisor compiled but none fit — microbatch 1 is the floor;
        # let XLA have the final say at run time, loudly
        logging.warning("no accumulation split fits the XLA plan within "
                        "%.2f GiB; proceeding with accum=%d",
                        budget / 2 ** 30, last)
        return last
    return None
