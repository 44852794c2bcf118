"""Space↔depth shuffles in NHWC with torch channel ordering.

The reference front-end packs the 4-channel input into 16 channels at half
resolution with ``F.pixel_unshuffle(x, 2)`` (Unetmodel.py:65-67) and
reconstructs the 1-channel output from a 4-channel head with
``F.pixel_shuffle(x, 2)`` (Unetmodel.py:69-88).  Channel ordering matters for
checkpoint parity: torch's pixel_unshuffle emits output channel
``c*r² + dy*r + dx`` for input channel ``c`` and intra-block offset
``(dy, dx)``; pixel_shuffle is the exact inverse.  These functions reproduce
that ordering in NHWC so torch-converted weights (models/torch_import.py)
line up channel-for-channel.

Two implementations:

- the reshape/transpose form (``pixel_unshuffle_nhwc`` /
  ``pixel_shuffle_nhwc``) — the reference semantics, used in training
  graphs;
- an MXU form (``*_mxu``) that expresses the lane-crossing W/dx part of
  the shuffle as a contraction with a static one-hot banded matrix
  (ops/resize.banded_apply) and keeps the H/dy part lane-preserving (row
  slices/stacks).  XLA lowers the transpose form of these shuffles as
  slow scalar-ish relayout copies on TPU — the r5b stage breakdown
  measured the channels-major twin of this shuffle at 3.14 ms of a
  6.0 ms 2K frame — while the one-hot matmul rides the systolic array.
  One-hot bf16 products under f32 accumulation are exact, so the two
  forms are bit-identical (tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pixel_unshuffle_nhwc(x: jax.Array, r: int = 2) -> jax.Array:
    """[N, H, W, C] → [N, H/r, W/r, C*r²], channel order c*r²+dy*r+dx
    (torch F.pixel_unshuffle parity; reference Unetmodel.py:67)."""
    n, h, w, c = x.shape
    if h % r or w % r:
        raise ValueError(f"pixel_unshuffle: spatial dims {(h, w)} not divisible by r={r}")
    x = x.reshape(n, h // r, r, w // r, r, c)    # [N, H', dy, W', dx, C]
    x = x.transpose(0, 1, 3, 5, 2, 4)            # [N, H', W', C, dy, dx]
    return x.reshape(n, h // r, w // r, c * r * r)  # ch = c*r² + dy*r + dx


def pixel_shuffle_nhwc(x: jax.Array, r: int = 2) -> jax.Array:
    """[N, H, W, C*r²] → [N, H*r, W*r, C], inverse of pixel_unshuffle_nhwc
    (torch F.pixel_shuffle parity; reference Unetmodel.py:86)."""
    n, h, w, crr = x.shape
    if crr % (r * r):
        raise ValueError(f"pixel_shuffle: channels {crr} not divisible by r²={r*r}")
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)              # [..., C, dy, dx]
    x = x.transpose(0, 1, 4, 2, 5, 3)            # [N, H, dy, W, dx, C]
    return x.reshape(n, h * r, w * r, c)

# ---------------------------------------------------------------------------
# MXU forms (r=2): the W/dx lane interleave as banded one-hot contractions.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _unshuffle_matrix(w: int, c: int, dy: int) -> np.ndarray:
    """[W/2·4C, W·C] one-hot for the dy half: out lane w'·4c + c·4 +
    dy·2 + dx ← in lane (2w' + dx)·c + ci."""
    m = np.zeros((w // 2 * 4 * c, w * c), np.float32)
    wprime = np.repeat(np.arange(w // 2), 2 * c)
    ci = np.tile(np.repeat(np.arange(c), 2), w // 2)
    dx = np.tile(np.arange(2), w // 2 * c)
    m[wprime * 4 * c + ci * 4 + dy * 2 + dx, (2 * wprime + dx) * c + ci] = 1.0
    return m


def pixel_unshuffle_nhwc_mxu(x: jax.Array, r: int = 2) -> jax.Array:
    """MXU twin of :func:`pixel_unshuffle_nhwc` (bit-identical)."""
    if r != 2:
        return pixel_unshuffle_nhwc(x, r)
    from pcss_unet_tpu.ops.resize import banded_apply

    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"pixel_unshuffle: spatial dims {(h, w)} not "
                         f"divisible by r=2")
    rows = x.reshape(n, h // 2, 2, w * c)
    out = (banded_apply(rows[:, :, 0], _unshuffle_matrix(w, c, 0),
                        axis=2, align=128)
           + banded_apply(rows[:, :, 1], _unshuffle_matrix(w, c, 1),
                          axis=2, align=128))
    return out.reshape(n, h // 2, w // 2, 4 * c)


@functools.lru_cache(maxsize=64)
def _shuffle_matrix(w: int, c: int, dy: int) -> np.ndarray:
    """[W·2·C, W·4C] one-hot for the dy half of pixel_shuffle: out lane
    (2w' + dx)·c + ci ← in lane w'·4c + ci·4 + dy·2 + dx."""
    m = np.zeros((w * 2 * c, w * 4 * c), np.float32)
    wprime = np.repeat(np.arange(w), 2 * c)
    ci = np.tile(np.repeat(np.arange(c), 2), w)
    dx = np.tile(np.arange(2), w * c)
    m[(2 * wprime + dx) * c + ci, wprime * 4 * c + ci * 4 + dy * 2 + dx] = 1.0
    return m


def pixel_shuffle_nhwc_mxu(x: jax.Array, r: int = 2) -> jax.Array:
    """MXU twin of :func:`pixel_shuffle_nhwc` (bit-identical)."""
    if r != 2:
        return pixel_shuffle_nhwc(x, r)
    from pcss_unet_tpu.ops.resize import banded_apply

    n, h, w, crr = x.shape
    if crr % 4:
        raise ValueError(f"pixel_shuffle: channels {crr} not divisible "
                         f"by r²=4")
    c = crr // 4
    flat = x.reshape(n, h, w * crr)
    halves = [banded_apply(flat, _shuffle_matrix(w, c, dy), axis=2,
                           align=128) for dy in (0, 1)]
    out = jnp.stack(halves, axis=2)            # [N, H, dy, 2W·C]
    return out.reshape(n, h * 2, w * 2, c)
