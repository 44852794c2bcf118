#!/usr/bin/env python
"""A/B the channels-major end-to-end engine (infer/chw_engine.py) against
the mixed NHWC model at the paper-native 2048×1024 and the 1080p headline
frame.  The engine removes the per-block pad/transpose pair the round-3
floor bench costed at ~0.5 ms per fused call at 2K (VERDICT r3 next-#3).

    python scripts/bench_chw.py            # full sweep on the chip
    PCSS_BENCH_SMOKE=1 python scripts/bench_chw.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    smoke = os.environ.get("PCSS_BENCH_SMOKE") == "1"
    import jax.numpy as jnp

    from pcss_unet_tpu.infer.chw_engine import chw_forward
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.models.fold_bn import fold_batchnorm
    from pcss_unet_tpu.utils.benchlib import measure_ms_per_frame
    import jax

    frames = {"2k": (128, 256) if smoke else (1024, 2048),
              "1080p": (64, 128) if smoke else (1088, 1920)}
    nets = {"w16": (16, 32, 128, 256)} if smoke else {
        "w16": (16, 32, 128, 256), "w64": (64, 128, 512, 1024)}
    rng = np.random.default_rng(0)

    for net, widths in nets.items():
        model_bn = UNet(encoder_widths=widths, dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        variables = fold_batchnorm(dict(model_bn.init(
            {"params": key, "dropout": key},
            jnp.zeros((1, 64, 64, 4), jnp.float32), False)))
        variables = {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}

        for fname, (h, w) in frames.items():
            x = jnp.asarray(
                rng.standard_normal((1, h, w, 4)).astype(np.float32))
            runs = {}
            # NHWC baselines (the round-3 postures)
            nhwc_fused = model_bn.clone(normalization="none",
                                        fused_inference=True)
            nhwc_int8 = model_bn.clone(normalization="none",
                                       fused_inference=True,
                                       int8_inference=True)
            os.environ["PCSS_CONVBLOCK_TAPS"] = "stack"
            try:
                runs["nhwc_fused"] = functools.partial(
                    lambda m, v, xx: m.apply(v, xx, False), nhwc_fused)
                if net == "w64":
                    runs["nhwc_fused_int8"] = functools.partial(
                        lambda m, v, xx: m.apply(v, xx, False), nhwc_int8)
                # channels-major end-to-end variants
                for use128 in (True, False):
                    runs[f"chw_use128={int(use128)}"] = functools.partial(
                        lambda u, v, xx: chw_forward(v, xx, taps="stack",
                                                     use128_chw=u), use128)
                if net == "w64":
                    runs["chw_int8"] = (
                        lambda v, xx: chw_forward(v, xx, taps="stack",
                                                  int8=True))
                for tag, fn in runs.items():
                    try:
                        ms = measure_ms_per_frame(fn, variables["params"],
                                                  variables["batch_stats"],
                                                  x)
                    except Exception as e:  # noqa: BLE001
                        print(f"{net}/{fname}/{tag} failed: {e}",
                              file=sys.stderr)
                        continue
                    print(json.dumps({
                        "metric": "chw_ab_ms_per_frame", "net": net,
                        "frame": f"{w}x{h}", "impl": tag,
                        "value": round(ms, 2),
                        "fps_per_chip": round(1000.0 / ms, 1)}), flush=True)
            finally:
                os.environ.pop("PCSS_CONVBLOCK_TAPS", None)


if __name__ == "__main__":
    main()
