"""Headline benchmark: 1080p shadow-mask inference throughput per chip.

Flagship model (reference U-Net configuration, bf16) on 1920×1080 frames
(padded to 1920×1088, ×16 alignment).  North star (BASELINE.json): ≥2000
1080p frames/min on a v5e-8 ≙ 4.167 frames/sec/chip — ``vs_baseline`` is
measured fps/chip divided by that.  Prints exactly ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS_PER_CHIP = 2000.0 / 60.0 / 8.0  # north-star per chip


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.infer.frame import InferenceEngine
    from pcss_unet_tpu.models import UNet

    model = UNet(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 64, 64, 4), jnp.float32), False)
    engine = InferenceEngine(model, dict(variables), dtype=jnp.bfloat16,
                             pad_multiple=16)

    h, w = 1088, 1920  # 1080p padded to ×16
    rng = np.random.default_rng(0)

    best_fps = 0.0
    best_batch = 1
    for batch in (1, 2, 4):
        try:
            frames = jnp.asarray(
                rng.standard_normal((batch, h, w, 4)).astype(np.float32))
            # warmup / compile.  NOTE: a bare block_until_ready can return
            # early through remote-execution relays, so every timed call is
            # forced by materializing a scalar reduction of the output.
            float(jnp.mean(engine.run_padded(frames)))
            float(jnp.mean(engine.run_padded(frames)))
            iters = 6
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                out = engine.run_padded(frames)
                float(jnp.mean(out))
                times.append(time.perf_counter() - t0)
            fps = batch / float(np.median(times))
            if fps > best_fps:
                best_fps, best_batch = fps, batch
        except Exception as e:  # noqa: BLE001 - e.g. HBM exhausted
            print(f"batch {batch} failed: {e}", file=sys.stderr)
            break

    result = {
        "metric": "1080p_inference_frames_per_sec_per_chip",
        "value": round(best_fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(best_fps / BASELINE_FPS_PER_CHIP, 3),
        "batch": best_batch,
        "device": str(jax.devices()[0]),
        "dtype": "bfloat16",
        "frame": f"{w}x{h}",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
