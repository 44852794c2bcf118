"""Multi-layer VGG-19 perceptual loss.

Reference ``MultiLayerVGGLoss`` (customLoss.py:7-90): clamp both images to
[0,1], scrub non-finite values (nan→0.5, +inf→1, −inf→0), repeat the
grayscale mask to 3 channels, normalize with mean 0.485 / std 0.229 (+1e-8),
take L1 between VGG-19 features at torchvision indices (2,7,12,21,30), and
blend with weights (0.25,0.25,0.3,0.1,0.1) normalized to sum 1.

TPU-first differences (documented, SURVEY.md §7 hard-part 2):

- one shared forward with in-flight taps instead of five truncated towers
  (identical math, ~2.5× fewer FLOPs) — models/vgg.py;
- the reference computes features under ``no_grad`` and re-wraps the result
  so its VGG term is **gradient-dead** (customLoss.py:69-71, 90): training
  gradients come from L1 alone.  ``grad`` switches this: False (default)
  reproduces the reference via ``stop_gradient``; True enables real
  perceptual gradients.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from pcss_unet_tpu.models.vgg import (
    DEFAULT_TAP_WEIGHTS, DEFAULT_TAPS, VGG19Features, load_vgg_params,
)

VGG_MEAN = 0.485   # customLoss.py:39
VGG_STD = 0.229    # customLoss.py:40


def _scrub(x: jax.Array) -> jax.Array:
    # customLoss.py:48-52 semantics
    x = jnp.nan_to_num(x, nan=0.5, posinf=1.0, neginf=0.0)
    return jnp.clip(x.astype(jnp.float32), 0.0, 1.0)


class PerceptualLoss:
    """Callable ``(output, target) -> scalar`` over NHWC single-channel
    images.  Holds the (frozen) VGG parameters."""

    def __init__(self, weights_path: str | None = None,
                 taps: Sequence[int] = DEFAULT_TAPS,
                 tap_weights: Sequence[float] = DEFAULT_TAP_WEIGHTS,
                 grad: bool = False):
        self.model = VGG19Features(taps=tuple(taps), dtype=jnp.float32)
        self.params = load_vgg_params(weights_path, taps=tuple(taps))
        w = jnp.asarray(tap_weights, jnp.float32)
        self.tap_weights = w / w.sum()       # customLoss.py:34-36
        self.grad = grad

    def _features(self, img: jax.Array) -> list[jax.Array]:
        img3 = jnp.repeat(img, 3, axis=-1)   # gray → 3ch, customLoss.py:55-56
        norm = (img3 - VGG_MEAN) / (VGG_STD + 1e-8)
        return self.model.apply({"params": self.params}, norm)

    def __call__(self, output: jax.Array, target: jax.Array) -> jax.Array:
        output = _scrub(output)
        target = _scrub(target)
        out_feats = self._features(output)
        tgt_feats = self._features(target)
        total = jnp.float32(0.0)
        for w, fo, ft in zip(self.tap_weights, out_feats, tgt_feats):
            fo = jnp.nan_to_num(fo, nan=0.0, posinf=1.0, neginf=-1.0)
            ft = jnp.nan_to_num(ft, nan=0.0, posinf=1.0, neginf=-1.0)
            total = total + w * jnp.mean(jnp.abs(fo - ft))
        if not self.grad:
            # reference's gradient-dead VGG branch (customLoss.py:69-71, 90)
            total = jax.lax.stop_gradient(total)
        return total
