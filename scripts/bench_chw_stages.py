#!/usr/bin/env python
"""Per-stage latency breakdown of the channels-major w16 forward at 2K.

The trimmed net sits at ~6 ms/frame = 13.9 % of bf16 peak — bandwidth/
overhead-bound, so the next lever must be chosen by measurement, not
FLOP counting.  This times every stage of ``chw_forward`` (w16 widths,
2048×1024) in isolation with the canonical carry-chained harness
(utils/benchlib.py), then the whole forward as a cross-check: the stage
sum should land within dispatch noise of the whole.

Stage shapes mirror infer/chw_engine.py's w16 trace exactly; params ride
as jit ARGUMENTS (never closure constants — device fetches through the
tunnel stall lower(), round-4 lesson).

    python scripts/bench_chw_stages.py            # TPU
    python scripts/bench_chw_stages.py --smoke    # CPU flow check
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
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + interpret kernels on CPU")
    ap.add_argument("--scan", type=int, default=0,
                    help="override scan difference (0 = canonical)")
    ap.add_argument("--taps", default="stack")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    from pcss_unet_tpu.infer import chw_engine as ce
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.models.fold_bn import fold_batchnorm
    from pcss_unet_tpu.ops.resize import compose_resize_matrices
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

    widths = (16, 32, 128, 256)
    model = UNet(encoder_widths=widths, dtype=dtype, dropout_rate=0.0)
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

    kw = dict(dtype=dtype, interpret=interp)
    taps = args.taps

    # (name, fn(params_subtree, x), params subtree, input array)
    # — w16 trace at 2048×1024: entry halves H,W; widths (16,32,128,256)
    h2, w2 = H // 2, W // 2
    stages = []

    def add(name, fn, sub, x):
        stages.append((name, fn, sub, x))

    add("entry", lambda p, x: ce._entry_chw(x, dtype), {},
        jnp.asarray(rng.standard_normal((1, H, W, 4)).astype(np.float32)))
    add("entry[mxu]", lambda p, x: ce._entry_chw_mxu(x, dtype), {},
        jnp.asarray(rng.standard_normal((1, H, W, 4)).astype(np.float32)))

    def blk(name, w):
        return lambda p, x: ce._block_chw(x, p, w, taps=taps, **kw)

    def blk_res(name, w, res):
        return lambda p, x: ce._block_chw(x, p["blk"], w, taps=taps,
                                          residual=p["res"], **kw)

    def interlude(name, w, int8):
        def f(p, x):
            out = ce._block_nhwc_dispatch(ce._to_nhwc(x, w), p, int8=int8,
                                          taps=taps, **kw)
            return ce._to_chw(out)
        return f

    add("enc_0 (16>16 chw)", blk("enc_0", w2), params["enc_0"],
        rand_chw(16, h2, w2))
    add("pool_0", lambda p, x: ce._pool2x_chw(x, w2), {},
        rand_chw(16, h2, w2))
    add("pool_0[mxu]", lambda p, x: ce._pool2x_chw_mxu(x, w2), {},
        rand_chw(16, h2, w2))
    add("enc_1 (16>32 chw)", blk("enc_1", w2 // 2), params["enc_1"],
        rand_chw(16, h2 // 2, w2 // 2))
    add("pool_1", lambda p, x: ce._pool2x_chw(x, w2 // 2), {},
        rand_chw(32, h2 // 2, w2 // 2))
    add("enc_2 (32>128 chw)", blk("enc_2", w2 // 4), params["enc_2"],
        rand_chw(32, h2 // 4, w2 // 4))
    add("pool_2", lambda p, x: ce._pool2x_chw(x, w2 // 4), {},
        rand_chw(128, h2 // 4, w2 // 4))
    add("enc_3 (128>256 nhwc)", interlude("enc_3", w2 // 8, False),
        params["enc_3"], rand_chw(128, h2 // 8, w2 // 8))
    add("enc_3[einsum]",
        lambda p, x: ce._block_chw_einsum(x, p, dtype=dtype),
        params["enc_3"], rand_chw(128, h2 // 8, w2 // 8))
    add("up_0 (C256)", lambda p, x: ce._upsample2x_chw(x, w2 // 8, dtype),
        {}, rand_chw(256, h2 // 8, w2 // 8))
    add("dec_0 (256>128 nhwc)", interlude("dec_0", w2 // 4, False),
        params["dec_0"], rand_chw(256, h2 // 4, w2 // 4))
    add("skip_add_dec0", lambda p, x: x + p["res"],
        {"res": rand_chw(128, h2 // 4, w2 // 4)},
        rand_chw(128, h2 // 4, w2 // 4))
    add("dec_0[einsum+res]",
        lambda p, x: ce._block_chw_einsum(x, p["blk"], dtype=dtype,
                                          residual=p["res"]),
        {"blk": params["dec_0"], "res": rand_chw(128, h2 // 4, w2 // 4)},
        rand_chw(256, h2 // 4, w2 // 4))
    add("up_1 (C128)", lambda p, x: ce._upsample2x_chw(x, w2 // 4, dtype),
        {}, rand_chw(128, h2 // 4, w2 // 4))
    add("dec_1 (128>32 chw+res)", blk_res("dec_1", w2 // 2, None),
        {"blk": params["dec_1"], "res": rand_chw(32, h2 // 2, w2 // 2)},
        rand_chw(128, h2 // 2, w2 // 2))
    add("up_2 (C32)", lambda p, x: ce._upsample2x_chw(x, w2 // 2, dtype),
        {}, rand_chw(32, h2 // 2, w2 // 2))
    add("dec_2 (32>16 chw+res)", blk_res("dec_2", w2, None),
        {"blk": params["dec_2"], "res": rand_chw(16, h2, w2)},
        rand_chw(32, h2, w2))

    m_h, m_w = compose_resize_matrices((h2, h2 * 2, h2), (w2, w2 * 2, w2))
    wp0 = ce._wp(w2)
    mwp = ce._pad_matrix(m_w, wp0, wp0)

    def head_resize(p, x):
        return ce._resize_chw(x, m_h, mwp, dtype)

    add("head_resize (composed)", head_resize, {}, rand_chw(16, h2, w2))
    add("dec_final (16>16 chw)", blk("dec_final", w2), params["dec_final"],
        rand_chw(16, h2, w2))

    def head_exit(p, x):
        hk = p["kernel"][0, 0].astype(dtype)
        x = jnp.einsum("oc,nchw->nohw", hk.T, x,
                       preferred_element_type=jnp.float32)
        x = x + p["bias"].astype(jnp.float32)[None, :, None, None]
        return ce._exit_nhwc(x.astype(dtype), W, 1)

    add("head_1x1+exit", head_exit, params["head"], rand_chw(16, h2, w2))

    def head_exit_mxu(p, x):
        hk = p["kernel"][0, 0].astype(dtype)
        x = jnp.einsum("oc,nchw->nohw", hk.T, x,
                       preferred_element_type=jnp.float32)
        x = x + p["bias"].astype(jnp.float32)[None, :, None, None]
        return ce._exit_nhwc_mxu(x.astype(dtype), W, 1)

    add("head_1x1+exit[mxu]", head_exit_mxu, params["head"],
        rand_chw(16, h2, w2))

    total = 0.0
    for name, fn, sub, x in stages:
        try:
            ms = measure_ms_per_frame(
                lambda v, xx, fn=fn: fn(v["params"], xx),
                sub, {}, x, scan_len=scan)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"stage": name, "error": str(e)[-200:]}),
                  flush=True)
            continue
        if "[" not in name:         # variant rows are not part of the sum
            total += ms
        print(json.dumps({"stage": name, "ms": round(ms, 4),
                          "shape": list(x.shape)}), flush=True)

    # whole-forward cross-check (same harness, same settings), both mover
    # implementations of the layout stages
    x_full = jnp.asarray(rng.standard_normal((1, H, W, 4)).astype(np.float32))
    print(json.dumps({"stage": "TOTAL(stage sum)", "ms": round(total, 3)}),
          flush=True)
    for movers in ("xla", "mxu"):
        whole = measure_ms_per_frame(
            lambda v, xx: ce.chw_forward(v, xx, dtype=dtype, taps=taps,
                                         movers=movers, interpret=interp),
            params, {}, x_full, scan_len=scan)
        print(json.dumps({"stage": f"WHOLE chw_forward[{movers}]",
                          "ms": round(whole, 3),
                          "frame": f"{W}x{H}", "taps": taps,
                          "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
