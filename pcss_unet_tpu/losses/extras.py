"""Auxiliary image-space loss terms.

The reference computes all three of these inside ``CustomLoss.forward`` and
then **discards them**, returning only the α-blend (customLoss.py:140-193 —
SURVEY.md §7 defect list).  Here they are real, config-gated terms
(Config.high_freq_weight / penumbra_weight / sobel_weight, default 0.0 for
reference parity)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _depthwise_conv(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Single-channel NHWC conv with SAME padding."""
    k = kernel[..., None, None].astype(img.dtype)  # [kh, kw, 1, 1]
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _to_gray(img: jax.Array) -> jax.Array:
    # customLoss.py:119-120 / 165: mean over channels if multi-channel
    if img.shape[-1] > 1:
        img = img.mean(axis=-1, keepdims=True)
    return img


def gaussian_kernel(size: int = 5, sigma: float = 1.0) -> jnp.ndarray:
    """2-D Gaussian, normalized (customLoss.py:106-114)."""
    x = np.arange(size) - size // 2
    xx, yy = np.meshgrid(x, x, indexing="xy")
    k = np.exp(-(xx ** 2 + yy ** 2) / (2 * sigma ** 2))
    return jnp.asarray(k / k.sum(), jnp.float32)


def high_freq_loss(output: jax.Array, target: jax.Array,
                   size: int = 5, sigma: float = 1.0) -> jax.Array:
    """L1 between high-frequency residuals (img − gaussian_blur(img));
    customLoss.py:116-127, 140-142."""
    k = gaussian_kernel(size, sigma)
    o = _to_gray(output.astype(jnp.float32))
    t = _to_gray(target.astype(jnp.float32))
    ho = o - _depthwise_conv(o, k)
    ht = t - _depthwise_conv(t, k)
    return jnp.mean(jnp.abs(ho - ht))


def penumbra_weighted_l1(output: jax.Array, target: jax.Array,
                         lo: float = 0.1, hi: float = 0.9) -> jax.Array:
    """L1 restricted to the penumbra band 0.1<target<0.9, normalized by the
    band size (customLoss.py:145-153)."""
    mask = ((target > lo) & (target < hi)).astype(jnp.float32)
    num = jnp.sum(jnp.abs(output * mask - target * mask))
    return num / (mask.sum() + 1e-8)


def sobel_gradient_loss(output: jax.Array, target: jax.Array) -> jax.Array:
    """L1 between Sobel gradient magnitudes; target side has no gradient
    path (customLoss.py:163-185)."""
    sx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    sy = sx.T

    def magnitude(img):
        g = _to_gray(img.astype(jnp.float32))
        gx = _depthwise_conv(g, sx)
        gy = _depthwise_conv(g, sy)
        return jnp.sqrt(gx ** 2 + gy ** 2 + 1e-6)

    tg = jax.lax.stop_gradient(magnitude(target))  # customLoss.py:177-178
    return jnp.mean(jnp.abs(magnitude(output) - tg))
