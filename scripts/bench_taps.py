#!/usr/bin/env python
"""Hardware A/B of ConvBlock tap strategies on the w16 2K stages.

The small-channel stages are N-stream-bound on the MXU (docs/BENCHMARKS.md
round-5 analysis): a [Cmid=16, K] dot pays per streamed column no matter
how empty M is.  Candidates:

- stack    : one K=9·Cin contraction (round-3 winner)
- chunk128 : taps grouped into exact K=128 chunks
- rowpack  : M=128 via 8 output rows per pass (block-Toeplitz weights)
- acc_shift: dx shifts on the output accumulators

Per-stage numbers at the real w16 2K shapes + the whole channels-major
forward per strategy.  JSON lines; run items under timeout in a session
script.

    python scripts/bench_taps.py [--strategies stack,rowpack] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--strategies", default="stack,chunk128,rowpack")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--scan", type=int, default=0)
    ap.add_argument("--skip_whole", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    from pcss_unet_tpu.infer import chw_engine as ce
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.models.fold_bn import fold_batchnorm
    from pcss_unet_tpu.utils.benchlib import measure_ms_per_frame

    interp = args.smoke
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        H, W = 64, 128
        scan = args.scan or 2
    else:
        H, W = 1024, 2048
        scan = args.scan or None
    dtype = jnp.float32 if args.smoke else jnp.bfloat16

    model = UNet(encoder_widths=(16, 32, 128, 256), dtype=dtype,
                 dropout_rate=0.0)
    key = jax.random.PRNGKey(0)
    folded = fold_batchnorm(dict(model.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 64, 64, 4), jnp.float32), False)))
    params = jax.device_put(folded["params"])

    rng = np.random.default_rng(0)

    def rand_chw(c, h, w):
        wp = ce._wp(w)
        x = np.zeros((1, c, h, wp), np.float32)
        x[..., :w] = rng.standard_normal((1, c, h, w)) * 0.1
        return jnp.asarray(x, dtype)

    h2, w2 = H // 2, W // 2
    stages = [
        ("enc_0 (16>16>16)", "enc_0", rand_chw(16, h2, w2), w2),
        ("enc_1 (16>32)", "enc_1", rand_chw(16, h2 // 2, w2 // 2), w2 // 2),
        ("dec_2 (32>16)", "dec_2", rand_chw(32, h2, w2), w2),
        ("dec_final (16>16)", "dec_final", rand_chw(16, h2, w2), w2),
    ]

    for strategy in args.strategies.split(","):
        for label, name, x, w in stages:
            fn = (lambda p, xx, w=w, strategy=strategy:
                  ce._block_chw(xx, p, w, taps=strategy, dtype=dtype,
                                interpret=interp))
            try:
                ms = measure_ms_per_frame(
                    lambda v, xx, fn=fn: fn(v["params"], xx),
                    params[name], {}, x, scan_len=scan)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"stage": label, "taps": strategy,
                                  "error": str(e)[-200:]}), flush=True)
                continue
            print(json.dumps({"stage": label, "taps": strategy,
                              "ms": round(ms, 4)}), flush=True)
        if args.skip_whole:
            continue
        x_full = jnp.asarray(
            rng.standard_normal((1, H, W, 4)).astype(np.float32))
        try:
            whole = measure_ms_per_frame(
                lambda v, xx, s=strategy: ce.chw_forward(
                    v, xx, dtype=dtype, taps=s, interpret=interp),
                params, {}, x_full, scan_len=scan)
            print(json.dumps({"stage": "WHOLE chw_forward",
                              "taps": strategy, "ms": round(whole, 3),
                              "frame": f"{W}x{H}",
                              "device": str(jax.devices()[0])}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"stage": "WHOLE chw_forward",
                              "taps": strategy,
                              "error": str(e)[-200:]}), flush=True)


if __name__ == "__main__":
    main()
