#!/usr/bin/env python
"""Training-throughput benchmark (secondary metric: train steps/sec).

Measures the full jitted train step (standardize + bf16 forward + loss +
backward + clip + optimizer) on synthetic data at the BASELINE.json config-1
shape (256×256 crops, batch 8) and at the reference's full config
(2048×1024, batch as fits).  Dependency-chained in-graph loop, same
measurement discipline as bench.py.  Prints one JSON line per config."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(tag, batch, h, w, loss_type="standard", scan_len=8,
                 accum=1):
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.config import Config
    from pcss_unet_tpu.losses import LossBundle, PerceptualLoss
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.train import build_train_step, create_train_state

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

    state, losses = run_steps(state, x, y)
    float(losses[-1])  # force
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run_steps(state, x, y)
        float(losses[-1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / scan_len
    print(json.dumps({
        "metric": f"train_steps_per_sec[{tag}]",
        "value": round(1.0 / dt, 3),
        "unit": "steps/sec",
        "ms_per_step": round(dt * 1e3, 2),
        "batch": batch, "frame": f"{w}x{h}", "loss_type": loss_type,
        "grad_accum_steps": accum,
    }))


def main() -> None:
    bench_config("256crop_b8_standard", 8, 256, 256)
    bench_config("256crop_b8_perturb", 8, 256, 256, loss_type="perturb",
                 scan_len=4)
    bench_config("1080p_b1_standard", 1, 1088, 1920, scan_len=2)
    # the reference's full training config (config.ini: 2048x1024, batch 8)
    # under gradient accumulation — whichever splits fit report their cost
    for accum in (1, 2, 4, 8):
        try:
            bench_config(f"2k_b8_accum{accum}_standard", 8, 1024, 2048,
                         scan_len=2, accum=accum)
        except Exception as e:  # noqa: BLE001 — e.g. HBM exhausted
            print(json.dumps({"metric":
                              f"train_steps_per_sec[2k_b8_accum{accum}]",
                              "error": str(e)[:200]}), file=sys.stderr)


if __name__ == "__main__":
    main()
