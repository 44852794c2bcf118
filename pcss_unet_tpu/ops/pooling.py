"""Average pooling matching the reference's ``nn.AvgPool2d(2)``
(Unetmodel.py:40-46): 2×2 window, stride 2, floor semantics on odd sizes.

In NHWC a 2×2/2 avg-pool is a reshape-mean — cheaper for XLA to fuse than
``lax.reduce_window`` and bit-identical to torch for even sizes (the model
only ever pools even sizes: the pipeline pads frames to ×16,
inference.py:154-163)."""

from __future__ import annotations

import jax


def avg_pool_2x(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2, :]  # floor semantics for odd sizes
    x = x.reshape(n, h2, 2, w2, 2, c)
    return x.mean(axis=(2, 4))
