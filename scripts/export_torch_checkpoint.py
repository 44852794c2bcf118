#!/usr/bin/env python
"""Export a framework checkpoint to a reference-consumable ``.pth``.

Takes an Orbax checkpoint directory (or reference-named .npz) and writes a
torch checkpoint in the reference's best-model format
``{'epoch', 'model_state_dict', 'loss'}`` (main.py:539-544) so the
reference's infer.py / inference.py / validate_consistency.py can load
models trained here."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="Orbax dir or reference-named .npz")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--loss", type=float, default=0.0)
    p.add_argument("--ema", action="store_true",
                   help="export the EMA parameters (ema_decay > 0 runs)")
    args = p.parse_args()

    import torch

    from pcss_unet_tpu.infer.frame import load_variables
    from pcss_unet_tpu.models.torch_import import export_to_torch_state_dict

    variables = load_variables(args.checkpoint, ema=args.ema)
    flat = export_to_torch_state_dict(variables)
    state_dict = {k: torch.from_numpy(np.asarray(v).copy())
                  for k, v in flat.items()}
    torch.save({"epoch": args.epoch, "model_state_dict": state_dict,
                "loss": args.loss}, args.out)
    print(f"wrote {args.out} ({len(state_dict)} tensors)")


if __name__ == "__main__":
    main()
