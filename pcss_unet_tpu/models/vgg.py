"""VGG-19 feature extractor for the multi-layer perceptual loss.

The reference builds five separate truncated torchvision ``vgg19.features``
towers ending at layer indices (2, 7, 12, 21, 30) and runs each one per loss
evaluation (customLoss.py:20-31, 66-83) — recomputing the shared prefix five
times.  Here the tower is a single Flax module evaluated once per image with
feature taps collected in-flight (identical math, ~2.5× fewer FLOPs, and one
fused XLA computation instead of five).

Tap indices follow torchvision's ``features`` indexing (conv outputs,
pre-ReLU, of conv1_2 / conv2_2 / conv3_2 / conv4_2 / conv5_2).

Weights: ImageNet-pretrained weights are loaded from an ``.npz`` produced by
``scripts/convert_vgg_weights.py`` (requires torchvision, run offline once).
On the zero-egress TPU image torchvision/pretrained weights are unavailable,
so absent an artifact the extractor falls back to a *fixed, seeded* He-init —
a deterministic random perceptual embedding (random VGG features are a known
usable perceptual metric); the deviation is logged once.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (torchvision index, out_channels) for every conv in vgg19.features
VGG19_CONVS: tuple[tuple[int, int], ...] = (
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256), (16, 256),
    (19, 512), (21, 512), (23, 512), (25, 512),
    (28, 512), (30, 512), (32, 512), (34, 512),
)
# torchvision indices of the max-pools between blocks
VGG19_POOLS = frozenset((4, 9, 18, 27, 36))

DEFAULT_TAPS = (2, 7, 12, 21, 30)      # customLoss.py:8
DEFAULT_TAP_WEIGHTS = (0.25, 0.25, 0.3, 0.1, 0.1)  # customLoss.py:8, normalized at :34-36


class VGG19Features(nn.Module):
    """Runs vgg19.features up to ``max(taps)`` and returns the tap outputs.

    Input: [B, H, W, 3] already VGG-normalized.  Compute dtype bf16-friendly;
    feature L1 differences are taken in fp32 by the loss.
    """

    taps: Sequence[int] = DEFAULT_TAPS
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        max_tap = max(self.taps)
        taps = set(self.taps)
        outputs: dict[int, jax.Array] = {}
        x = x.astype(self.dtype)
        for idx in range(0, max_tap + 1):
            conv = next(((i, ch) for i, ch in VGG19_CONVS if i == idx), None)
            if conv is not None:
                _, ch = conv
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=self.param_dtype, name=f"conv_{idx}")(x)
            elif idx in VGG19_POOLS:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                # ReLU slots in torchvision indexing
                x = nn.relu(x)
            if idx in taps:
                outputs[idx] = x
        return [outputs[i] for i in self.taps]


def init_vgg_params(taps: Sequence[int] = DEFAULT_TAPS, seed: int = 0,
                    dtype=jnp.float32) -> dict:
    """Deterministic seeded init (fallback when no pretrained artifact)."""
    model = VGG19Features(taps=taps, dtype=dtype)
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, 64, 64, 3), dtype)
    return model.init(key, dummy)["params"]


def vgg_weights_provenance(path: str | None) -> str:
    """What the perceptual loss will actually run on — recorded in
    resolved_config.json so a training run with random features is
    auditable, not silent."""
    if path and os.path.exists(path):
        return f"pretrained:{path}"
    return "random-seeded-fallback"


def load_vgg_params(path: str | None, taps: Sequence[int] = DEFAULT_TAPS,
                    dtype=jnp.float32) -> dict:
    """Load converted torchvision weights from .npz; keys
    ``conv_{idx}_kernel`` (HWIO) / ``conv_{idx}_bias``.  Falls back to the
    seeded init when ``path`` is empty/missing."""
    if not path or not os.path.exists(path):
        # LOUD on purpose: the reference trains on ImageNet VGG features
        # (customLoss.py:20); random features are a usable perceptual
        # embedding but NOT loss-value-parity with the reference.
        if path:
            logging.warning(
                "VGG weights artifact %s NOT FOUND — perceptual loss will "
                "run on seeded-random features (no ImageNet parity). "
                "Produce the artifact on a dev machine: "
                "python scripts/convert_vgg_weights.py --out %s", path, path)
        else:
            logging.warning(
                "No VGG weights artifact configured (vgg_weights_path is "
                "empty) — perceptual loss will run on seeded-random "
                "features (no ImageNet parity). One-command recipe: "
                "python scripts/convert_vgg_weights.py --out "
                "vgg19_imagenet.npz  (requires torchvision; then set "
                "vgg_weights_path)")
        return init_vgg_params(taps=taps, dtype=dtype)
    data = np.load(path)
    params: dict = {}
    max_tap = max(taps)
    for idx, _ in VGG19_CONVS:
        if idx > max_tap:
            break
        params[f"conv_{idx}"] = {
            "kernel": jnp.asarray(data[f"conv_{idx}_kernel"], dtype),
            "bias": jnp.asarray(data[f"conv_{idx}_bias"], dtype),
        }
    return params
