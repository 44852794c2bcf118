#!/usr/bin/env python
"""Training-throughput benchmark (secondary metric: train steps/sec).

Measures the full jitted train step (standardize + bf16 forward + loss +
backward + clip + optimizer) on synthetic data at the BASELINE.json config-1
shape (256×256 crops, batch 8) and at the reference's full training config
(2048×1024 batch 8, /root/reference/config.ini:4-29) under gradient
accumulation.  Uses the canonical carry-chained measurement discipline
(chained train states through lax.scan).  Prints one JSON line per config.

Each config runs in its OWN subprocess (``--only TAG``): the TPU's
``peak_bytes_in_use`` counter is per-process-lifetime, so isolation gives a
true per-config HBM high-water mark — which each row reports next to the
memory governor's analytic estimate (utils/memory.py), validating the
governor against reality — and an HBM-exhausted config kills only its own
subprocess, not the sweep.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# tag -> (batch, h, w, loss_type, scan_len, accum)
CONFIGS = {
    "256crop_b8_standard": (8, 256, 256, "standard", 8, 1),
    "256crop_b8_perturb": (8, 256, 256, "perturb", 4, 1),
    "1080p_b1_standard": (1, 1088, 1920, "standard", 2, 1),
    # the reference's full training config (config.ini: 2048x1024, batch 8)
    # under gradient accumulation — whichever splits fit report their cost
    "2k_b8_accum1_standard": (8, 1024, 2048, "standard", 2, 1),
    "2k_b8_accum2_standard": (8, 1024, 2048, "standard", 2, 2),
    "2k_b8_accum4_standard": (8, 1024, 2048, "standard", 2, 4),
    "2k_b8_accum8_standard": (8, 1024, 2048, "standard", 2, 8),
}

# the paper trains ≤400 images, 75 epochs, ~16 h (paper.md:219); at batch 8
PAPER_EPOCH_IMAGES = 400
PAPER_EPOCHS = 75
PAPER_HOURS = 16.0


def bench_config(tag, batch, h, w, loss_type="standard", scan_len=8,
                 accum=1):
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    from pcss_unet_tpu.config import Config
    from pcss_unet_tpu.losses import LossBundle, PerceptualLoss
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.train import build_train_step, create_train_state
    from pcss_unet_tpu.utils.memory import (device_memory_stats,
                                            estimate_memory_usage,
                                            param_count)

    cfg = Config(batch_size=batch, num_epochs=100, warmup_epochs=5,
                 loss_type=loss_type, grad_accum_steps=accum)
    model = UNet(dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, steps_per_epoch=100,
                               sample_shape=(batch, h, w, 4))
    bundle = LossBundle(perceptual=PerceptualLoss(None),
                        alpha=cfg.alpha, perturb_weight=cfg.perturb_weight,
                        perturbation_count=cfg.perturbation_count)
    step = build_train_step(cfg, bundle, np.zeros(4, np.float32),
                            np.ones(4, np.float32), 100,
                            per_block_norms=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, h, w, 4)).astype(np.float32))
    y = jnp.asarray(rng.random((batch, h, w, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run_steps(state, x, y):
        def body(st, _):
            st2, metrics = step(st, x, y, key)
            return st2, metrics["total_loss"]
        final, losses = jax.lax.scan(body, state, None, length=scan_len)
        return final, losses

    # XLA's own static memory plan for the compiled step — the honest
    # counterpart to the governor's analytic estimate (the axon tunnel
    # exposes no runtime memory_stats)
    mem = None
    try:
        ma = run_steps.lower(state, x, y).compile().memory_analysis()
        if ma is not None:
            mem = {
                "xla_args_gib": round(ma.argument_size_in_bytes / 2 ** 30, 2),
                "xla_temp_gib": round(ma.temp_size_in_bytes / 2 ** 30, 2),
                "xla_total_gib": round(
                    (ma.argument_size_in_bytes + ma.output_size_in_bytes
                     + ma.temp_size_in_bytes) / 2 ** 30, 2),
            }
    except Exception:  # noqa: BLE001 — memory analysis is best-effort
        pass

    state, losses = run_steps(state, x, y)
    float(losses[-1])  # force
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run_steps(state, x, y)
        float(losses[-1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / scan_len
    row = {
        "metric": f"train_steps_per_sec[{tag}]",
        "value": round(1.0 / dt, 3),
        "unit": "steps/sec",
        "ms_per_step": round(dt * 1e3, 2),
        "batch": batch, "frame": f"{w}x{h}", "loss_type": loss_type,
        "grad_accum_steps": accum,
    }
    # HBM high-water (per-process peak — this subprocess ran ONLY this
    # config) vs the governor's analytic estimate for the live microbatch
    n_params = param_count(state.params)
    est = estimate_memory_usage(n_params, max(1, batch // accum), h, w,
                                optimizer=cfg.optimizer_type)
    row["governor_est_gib"] = round(est["total"] / 2 ** 30, 2)
    if mem:
        row.update(mem)
    stats = device_memory_stats()
    if stats and stats.get("peak_bytes_in_use"):
        row["hbm_peak_gib"] = round(stats["peak_bytes_in_use"] / 2 ** 30, 2)
        if stats.get("bytes_limit"):
            row["hbm_limit_gib"] = round(stats["bytes_limit"] / 2 ** 30, 2)
    # projected epoch/run time at the paper's training budget
    if h >= 1024 and batch == 8:
        epoch_s = PAPER_EPOCH_IMAGES / batch * dt
        row["epoch_s_at_400img"] = round(epoch_s, 1)
        row["hours_75_epochs"] = round(epoch_s * PAPER_EPOCHS / 3600, 3)
        row["vs_paper_16h"] = round(
            PAPER_HOURS / (epoch_s * PAPER_EPOCHS / 3600), 1)
    print(json.dumps(row), flush=True)


def main() -> None:
    if len(sys.argv) == 3 and sys.argv[1] == "--only":
        tag = sys.argv[2]
        batch, h, w, loss_type, scan_len, accum = CONFIGS[tag]
        bench_config(tag, batch, h, w, loss_type, scan_len, accum)
        return
    # parent: one subprocess per config — isolated HBM peaks, OOM-tolerant.
    # PREPEND the repo to PYTHONPATH (never replace it: the TPU plugin
    # registers via a sitecustomize on the inherited PYTHONPATH)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (repo + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else repo)
    for tag in CONFIGS:
        try:
            p = subprocess.run([sys.executable, os.path.abspath(__file__),
                                "--only", tag],
                               env=env, timeout=1500, capture_output=True,
                               text=True)
            sys.stdout.write(p.stdout)
            sys.stdout.flush()
            if p.returncode != 0:
                # record the child's REAL exit code and the last traceback
                # line — a failure row that says "exit 0" with no reason
                # defeats per-item JSONL evidence (round-4 lesson)
                tail = [ln for ln in (p.stderr or "").splitlines()
                        if ln.strip()]
                print(json.dumps({
                    "metric": f"train_steps_per_sec[{tag}]",
                    "rc": p.returncode,
                    "error": tail[-1][-400:] if tail else "no stderr",
                    "stderr_tail": (p.stderr or "")[-400:]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"metric": f"train_steps_per_sec[{tag}]",
                              "rc": 124,
                              "error": "timeout (1500s)"}), flush=True)


if __name__ == "__main__":
    main()
