"""Temporal-stability evaluation CLI.

Computes the paper's temporal-instability metric (eq. 3; reference
implementation pert_loss.py:170-199 with a stubbed motion branch, completed
here) over a *sequence* of G-buffer frames: run inference on each frame in
order, then measure ``mean(exp(α·|I_t − warp(I_{t−1})|) − 1)``.  Optional
motion vectors come from `.npy` files ([T-1, H, W, 2] (dy, dx) in pixels).
This is the quantitative capability behind the perturbation loss's whole
reason to exist."""

import argparse
import os

import numpy as np

from pcss_unet_tpu.config import load_config
from pcss_unet_tpu.utils.logging import setup_logger


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Temporal instability of an "
                                            "inferred shadow sequence")
    p.add_argument("--frames_dir", required=True,
                   help="directory of sequential *.exr frames (sorted order)")
    p.add_argument("--weights", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--stats_dir", default=None)
    p.add_argument("--ema", action="store_true",
                   help="measure the EMA parameters (ema_decay > 0 runs)")
    p.add_argument("--motion_vectors", default=None,
                   help=".npy [T-1, H, W, 2] per-pixel (dy, dx)")
    p.add_argument("--alpha", type=float, default=3.0,
                   help="exponent weight (paper uses 3; reference default 5)")
    p.add_argument("--save_masks_dir", default=None)
    p.add_argument("--fold_bn", action="store_true",
                   help="fold BN and enable the fused deployment kernels "
                        "(same posture as cli.infer --fold_bn)")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="int8 deployment posture (requires --fold_bn)")
    args = p.parse_args(argv)
    setup_logger()

    import jax.numpy as jnp

    from pcss_unet_tpu.data.stats import load_channel_stats
    from pcss_unet_tpu.infer import InferenceEngine, load_variables
    from pcss_unet_tpu.io.exr import read_exr_stack
    from pcss_unet_tpu.io.png import write_mask_png
    from pcss_unet_tpu.losses import measure_temporal_instability
    from pcss_unet_tpu.models import unet_for_variables

    cfg = load_config(args.config)
    variables = load_variables(args.weights, ema=args.ema)
    model = unet_for_variables(cfg, variables)
    means = stds = None
    if args.stats_dir:
        means, stds = load_channel_stats(args.stats_dir)
    engine = InferenceEngine(model, variables, means=means, stds=stds,
                             fold_bn=args.fold_bn, quantize=args.quantize)

    exrs = sorted(f for f in os.listdir(args.frames_dir)
                  if f.endswith(".exr"))
    if len(exrs) < 2:
        raise SystemExit("need at least 2 frames")
    masks = []
    for fname in exrs:
        frame = read_exr_stack(os.path.join(args.frames_dir, fname))
        mask = engine(frame)
        masks.append(mask)
        if args.save_masks_dir:
            os.makedirs(args.save_masks_dir, exist_ok=True)
            write_mask_png(os.path.join(args.save_masks_dir,
                                        fname.replace(".exr", ".png")), mask)
    frames = jnp.asarray(np.stack(masks))[:, None]  # [T, B=1, H, W, 1]
    mv = None
    if args.motion_vectors:
        mv = jnp.asarray(np.load(args.motion_vectors))[:, None]
    score = float(measure_temporal_instability(frames, mv, alpha=args.alpha))
    print(f"frames: {len(exrs)}")
    print(f"temporal instability (alpha={args.alpha}): {score:.6f}")


if __name__ == "__main__":
    main()
