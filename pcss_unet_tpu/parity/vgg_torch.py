"""Torch-side VGG-19 feature tower + weight conversion (parity harness).

The reference's perceptual loss taps torchvision ``vgg19.features`` at
layer indices 2/7/12/21/30 (customLoss.py:8, 20-31).  torchvision is not
installed on this image, but torch is — so this module builds the public
``vgg19.features`` layer sequence in raw torch (Conv2d 3x3 pad 1 / ReLU /
MaxPool2d 2x2, VGG configuration "E") with indices identical to
torchvision's, which lets us:

- validate the OIHW→HWIO conversion pipeline end-to-end against a live
  torch forward (tests/test_vgg_convert.py), and
- convert any vgg19.features-shaped state dict (including the real
  IMAGENET1K_V1 one, via scripts/convert_vgg_weights.py on a dev machine).

The layer table is shared with the Flax tower (models/vgg.py) so the index
contract cannot drift between the two implementations.
"""

from __future__ import annotations

import numpy as np

from pcss_unet_tpu.models.vgg import VGG19_CONVS, VGG19_POOLS

# torchvision vgg19.features has indices 0..36 (last ReLU at 35, pool at 36)
N_FEATURE_LAYERS = 37


def build_vgg19_features_torch():
    """→ ``torch.nn.Sequential`` with torchvision's exact vgg19.features
    layer order and indices (randomly initialized)."""
    import torch.nn as nn

    convs = dict(VGG19_CONVS)
    layers = []
    in_ch = 3
    for idx in range(N_FEATURE_LAYERS):
        if idx in convs:
            layers.append(nn.Conv2d(in_ch, convs[idx], kernel_size=3,
                                    padding=1))
            in_ch = convs[idx]
        elif idx in VGG19_POOLS:
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.ReLU(inplace=True))
    return nn.Sequential(*layers)


def convert_features_module(seq) -> dict[str, np.ndarray]:
    """Convert a vgg19.features-shaped ``nn.Sequential`` to the .npz key
    layout ``models.vgg.load_vgg_params`` consumes: ``conv_{idx}_kernel``
    (HWIO) / ``conv_{idx}_bias`` per conv layer."""
    out: dict[str, np.ndarray] = {}
    for idx, layer in enumerate(seq):
        w = getattr(layer, "weight", None)
        if w is None or w.dim() != 4:
            continue
        w = w.detach().cpu().numpy()                     # OIHW
        out[f"conv_{idx}_kernel"] = np.ascontiguousarray(
            np.transpose(w, (2, 3, 1, 0)))               # → HWIO
        out[f"conv_{idx}_bias"] = layer.bias.detach().cpu().numpy()
    return out


def torch_tap_activations(seq, x_nchw, taps) -> list[np.ndarray]:
    """Run the torch tower, returning activations at the tap indices as
    NHWC numpy arrays (the Flax tower's output layout)."""
    import torch

    taps = set(taps)
    outs: dict[int, np.ndarray] = {}
    with torch.no_grad():
        h = torch.as_tensor(x_nchw)
        for idx, layer in enumerate(seq):
            h = layer(h)
            if idx in taps:
                # .clone(): the next layer may be ReLU(inplace=True), which
                # would retroactively mutate a shared-memory .numpy() view
                outs[idx] = h.clone().numpy().transpose(0, 2, 3, 1)
            if idx >= max(taps):
                break
    return [outs[i] for i in sorted(taps)]
