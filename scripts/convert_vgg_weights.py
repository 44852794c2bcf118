#!/usr/bin/env python
"""Offline conversion: torchvision VGG-19 IMAGENET1K_V1 weights → the .npz
artifact ``pcss_unet_tpu.models.vgg.load_vgg_params`` consumes.

Run this ONCE on a machine with torchvision + network access (the TPU image
has neither), then ship the .npz:

    python scripts/convert_vgg_weights.py --out vgg19_imagenet.npz

Keys: ``conv_{torchvision_index}_kernel`` (HWIO) / ``conv_{idx}_bias`` for
every conv in vgg19.features (reference loss taps the conv outputs at
indices 2/7/12/21/30 — customLoss.py:8)."""

import argparse

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="vgg19_imagenet.npz")
    args = p.parse_args()

    try:
        from torchvision import models
    except ImportError as e:
        raise SystemExit(
            f"torchvision required for conversion ({e}); run on a dev "
            "machine and copy the .npz artifact") from e

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # the conversion path itself is validated against a live torch forward
    # in tests/test_vgg_convert.py (no torchvision needed there)
    from pcss_unet_tpu.parity.vgg_torch import convert_features_module

    vgg = models.vgg19(weights=models.VGG19_Weights.IMAGENET1K_V1).features
    out = convert_features_module(vgg)
    np.savez(args.out, **out)
    print(f"wrote {len(out)} arrays to {args.out}")


if __name__ == "__main__":
    main()
