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

These are pure reshape/transpose ops — XLA lowers them to free layout
changes or a single relayout copy; no Pallas needed.
"""

from __future__ import annotations

import jax


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
