#!/usr/bin/env python
"""Measure ONE bench candidate in an isolated, killable process.

Used by bench.py for the channels-major (chw) candidates: a wedged remote
XLA/Mosaic compile blocks inside C++ and cannot be interrupted in-process
(no Python bytecode runs, so no exception/signal lands) — observed on
hardware 2026-08-19, where a w64 chw compile that normally takes minutes
hung >60 min on a sick tunnel.  A child process can simply be killed on
timeout, so the headline bench always completes.

Prints exactly ONE JSON line:
    {"ms_per_frame": float, "flops_per_frame": float|null, ...}

    python scripts/bench_probe.py --impl chw --height 1088 --width 1920
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="64,128,512,1024",
                    help="comma-separated encoder widths")
    ap.add_argument("--impl", required=True,
                    choices=["plain", "fused", "fused_int8",
                             "chw", "chw_int8"])
    ap.add_argument("--taps", default="stack")
    ap.add_argument("--movers", default="mxu", choices=["mxu", "xla"],
                    help="chw engine layout-stage implementation "
                         "(entry/pools/exit): banded MXU contractions or "
                         "the plain XLA reshape/transpose lowerings")
    ap.add_argument("--wide", default="auto",
                    choices=["auto", "einsum", "nhwc"],
                    help="chw engine wide-stage path: channels-major "
                         "shifted einsums or the NHWC interlude")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--scan", type=int, default=0,
                    help="scan_len for measure_ms_per_frame (0 = canonical)")
    ap.add_argument("--skip_flops", action="store_true")
    ap.add_argument("--flops_only", action="store_true",
                    help="report the XLA FLOP count of one forward and "
                         "skip the latency measurement entirely (cheap "
                         "roofline accounting for bench.py)")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU validation of the "
                         "chw candidates; never for real numbers)")
    args = ap.parse_args()

    import numpy as np

    import jax

    if args.interpret:
        # --interpret means CPU validation: pin the platform via config
        # (JAX_PLATFORMS=cpu is IGNORED on images where the TPU-tunnel
        # plugin force-registers itself — an "interpret" run would
        # otherwise still dispatch XLA ops to the real chip and perturb
        # any concurrent measurement session)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pcss_unet_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    from pcss_unet_tpu.infer.chw_engine import chw_forward
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.models.fold_bn import fold_batchnorm
    from pcss_unet_tpu.utils.benchlib import (forward_flops,
                                              measure_ms_per_frame)

    widths = tuple(int(t) for t in args.widths.split(","))
    model_bn = UNet(encoder_widths=widths, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    folded = fold_batchnorm(dict(model_bn.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 64, 64, 4), jnp.float32), False)))
    params, batch_stats = folded["params"], folded["batch_stats"]

    # per-stage taps: "dec_final=chunk128,*=stack" parses to a dict
    taps = (dict(kv.split("=") for kv in args.taps.split(","))
            if "=" in args.taps else args.taps)
    if isinstance(taps, str):
        os.environ["PCSS_CONVBLOCK_TAPS"] = taps
    if args.impl == "chw":
        fn = lambda v, x: chw_forward(v, x, taps=taps,  # noqa: E731
                                      movers=args.movers, wide=args.wide,
                                      interpret=args.interpret)
    elif args.impl == "chw_int8":
        fn = lambda v, x: chw_forward(v, x, taps=taps,  # noqa: E731
                                      movers=args.movers, wide=args.wide,
                                      int8=True, interpret=args.interpret)
    else:
        kw: dict = {"normalization": "none"}
        if args.impl in ("fused", "fused_int8"):
            kw["fused_inference"] = True
        if args.impl == "fused_int8":
            kw["int8_inference"] = True
        model = model_bn.clone(**kw)
        fn = lambda v, x: model.apply(v, x, False)  # noqa: E731

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (args.batch, args.height, args.width, 4)).astype(np.float32))
    ms = None
    if not args.flops_only:
        ms = measure_ms_per_frame(fn, params, batch_stats, x,
                                  scan_len=args.scan or None)
    flops = None
    if args.flops_only or not args.skip_flops:
        total = forward_flops(fn, params, batch_stats, x)
        if total:
            flops = total / args.batch
    row = {
        "ms_per_frame": ms, "flops_per_frame": flops,
        "impl": args.impl, "taps": args.taps, "batch": args.batch,
        "frame": f"{args.width}x{args.height}", "device": str(jax.devices()[0]),
    }
    if args.impl.startswith("chw"):
        row["movers"] = args.movers
        row["wide"] = args.wide
    print(json.dumps(row))


if __name__ == "__main__":
    main()
