"""Batch-serving CLI: stream a directory of G-buffer EXR frames through the
pipeline server (infer/server.py) and write uint8 mask PNGs.

    python -m pcss_unet_tpu.cli.serve --frames_dir renders/ --out_dir masks/ \
        --weights ./checkpoints/42 --stats_dir ./data/processed --batch 4
"""

import argparse
import os

from pcss_unet_tpu.config import load_config
from pcss_unet_tpu.utils.logging import setup_logger


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Streaming batch inference")
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--stats_dir", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--ema", action="store_true",
                   help="deploy the EMA parameters (ema_decay > 0 runs)")
    p.add_argument("--decode_workers", type=int, default=4)
    p.add_argument("--fold_bn", action="store_true", default=True)
    p.add_argument("--no_fold_bn", dest="fold_bn", action="store_false")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="int8: dynamic-int8 convs for the MXU-bound "
                        "stages (requires fold_bn; docs/BENCHMARKS.md)")
    args = p.parse_args(argv)
    setup_logger()

    import jax.numpy as jnp
    from PIL import Image

    from pcss_unet_tpu.data.stats import load_channel_stats
    from pcss_unet_tpu.infer import InferenceEngine, load_variables
    from pcss_unet_tpu.infer.server import ShadowServer
    from pcss_unet_tpu.models import unet_for_variables

    cfg = load_config(args.config)
    variables = load_variables(args.weights, ema=args.ema)
    model = unet_for_variables(cfg, variables)
    means = stds = None
    if args.stats_dir:
        means, stds = load_channel_stats(args.stats_dir)
    engine = InferenceEngine(model, variables, means=means, stds=stds,
                             dtype=jnp.bfloat16, fold_bn=args.fold_bn,
                             quantize=args.quantize)
    server = ShadowServer(engine, batch_size=args.batch,
                          decode_workers=args.decode_workers)

    paths = [os.path.join(args.frames_dir, f)
             for f in sorted(os.listdir(args.frames_dir))
             if f.endswith(".exr")]
    os.makedirs(args.out_dir, exist_ok=True)

    def sink(path: str, mask_u8) -> None:
        name = os.path.splitext(os.path.basename(path))[0] + ".png"
        Image.fromarray(mask_u8[..., 0], "L").save(
            os.path.join(args.out_dir, name))

    stats = server.run(paths, sink)
    print(f"{stats.frames} frames, {stats.wall_seconds:.2f}s, "
          f"{stats.fps:.1f} fps")


if __name__ == "__main__":
    main()
