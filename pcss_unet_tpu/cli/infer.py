"""Inference CLI (reference infer.py + inference.py roles).

Reference flags preserved: ``--input x.exr --output y.png --weights ckpt``
(infer.py:13-18).  Accepts Orbax checkpoint dirs, ``.npz`` exports, and
reference ``.pth`` files (both formats, infer.py:36-41).  ``--save_format``
L/RGB/RGBA mirrors inference.py:111-128; ``--tile``/``--halo`` engage the
halo-tiled path; ``--stats_dir`` applies train-set standardization like the
training pipeline."""

import argparse
import time

from pcss_unet_tpu.config import load_config
from pcss_unet_tpu.io.exr import read_exr_stack
from pcss_unet_tpu.io.png import write_mask_png
from pcss_unet_tpu.utils.logging import setup_logger


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Shadow-mask inference on a "
                                            "G-buffer EXR stack")
    p.add_argument("--input", required=True, help="input .exr")
    p.add_argument("--output", required=True, help="output .png")
    p.add_argument("--weights", required=True,
                   help="Orbax dir | .npz export | reference .pth")
    p.add_argument("--config", default=None)
    p.add_argument("--stats_dir", default=None,
                   help="directory with train_stats.npy for standardization")
    p.add_argument("--save_format", choices=["L", "RGB", "RGBA"], default="L")
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--tile", type=int, default=0,
                   help=">0 → halo-tiled inference with this tile size")
    p.add_argument("--halo", type=int, default=32)
    p.add_argument("--fold_bn", action="store_true",
                   help="deployment posture: fold BatchNorm into the convs "
                        "(exact at eval) and enable the fused Pallas "
                        "ConvBlock path on TPU")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="int8: dynamic-int8 convs for the MXU-bound "
                        "stages (requires --fold_bn; docs/BENCHMARKS.md)")
    p.add_argument("--layout", choices=["nhwc", "chw"], default="nhwc",
                   help="chw: channels-major end-to-end forward — the "
                        "fastest measured deployment posture at 1080p/2K "
                        "(requires --fold_bn and a TPU; docs/BENCHMARKS.md)")
    p.add_argument("--ema", action="store_true",
                   help="deploy the EMA parameters (checkpoints from "
                        "ema_decay > 0 runs carry them alongside the raw "
                        "weights)")
    p.add_argument("--decode_threads", type=int, default=0,
                   help="EXR chunk-decode threads (0 = hardware count; "
                        "single-file decode dominates this CLI's latency)")
    args = p.parse_args(argv)
    setup_logger()

    from pcss_unet_tpu.io.exr import set_decode_threads
    set_decode_threads(args.decode_threads)

    import os
    if os.environ.get("PCSS_COMPILE_CACHE", "1") != "0":
        # 2K-scale inference graphs cost minutes to compile on tunneled
        # TPU hosts; cache the executable across invocations.
        from pcss_unet_tpu.utils.compilecache import enable_persistent_cache

        enable_persistent_cache()

    import jax.numpy as jnp

    from pcss_unet_tpu.data.stats import load_channel_stats
    from pcss_unet_tpu.infer import InferenceEngine, infer_tiled, load_variables
    from pcss_unet_tpu.models import unet_for_variables

    cfg = load_config(args.config)
    variables = load_variables(args.weights, ema=args.ema)
    # The checkpoint, not the config, is the authority on the architecture
    # (a reference user loading a trimmed/custom .pth should never have to
    # reverse-engineer base_width/model_depth — infer.py:36-41 never asks).
    model = unet_for_variables(cfg, variables)
    means = stds = None
    if args.stats_dir:
        means, stds = load_channel_stats(args.stats_dir)
    engine = InferenceEngine(model, variables, means=means, stds=stds,
                             dtype=jnp.dtype(args.dtype),
                             pad_multiple=cfg.pad_multiple,
                             fold_bn=args.fold_bn, quantize=args.quantize,
                             layout=args.layout)

    frame = read_exr_stack(args.input)
    t0 = time.perf_counter()
    if args.tile > 0:
        mask = infer_tiled(engine, frame, tile=args.tile, halo=args.halo)
    else:
        mask = engine(frame)
    dt = time.perf_counter() - t0
    write_mask_png(args.output, mask, mode=args.save_format)
    print(f"wrote {args.output}  ({frame.shape[1]}x{frame.shape[0]}, "
          f"{dt * 1e3:.1f} ms incl. compile)")


if __name__ == "__main__":
    main()
