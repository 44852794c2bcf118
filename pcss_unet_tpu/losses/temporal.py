"""Temporal-instability metric (paper eq. 3).

Reference ``measure_temporal_instability`` (pert_loss.py:170-199):
``mean(exp(α·|I_t − warp(I_{t−1})|) − 1)`` averaged over consecutive frame
pairs, α=5 by reference default (the paper uses α=3, paper.md:133 — pass
``alpha=3.0`` for paper numbers).

The reference's motion-vector branch is a ``pass`` stub (pert_loss.py:187-190);
here it is implemented: frames are backward-warped by per-pixel motion
vectors (align-corners bilinear sampling) before differencing, which is the
quantity the paper actually reports for moving sequences."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _warp(frame: jax.Array, motion: jax.Array) -> jax.Array:
    """Backward-warp [B,H,W,C] by motion [B,H,W,2] (dy, dx in pixels):
    out(y, x) = frame(y − dy, x − dx), bilinear, edge-clamped."""
    b, h, w, c = frame.shape
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    src_y = jnp.clip(yy - motion[..., 0], 0.0, h - 1)
    src_x = jnp.clip(xx - motion[..., 1], 0.0, w - 1)
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (src_y - y0)[..., None]
    wx = (src_x - x0)[..., None]

    def gather(yi, xi):
        batch_idx = jnp.arange(b)[:, None, None]
        return frame[batch_idx, yi, xi]

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def measure_temporal_instability(frames: jax.Array,
                                 motion_vectors: jax.Array | None = None,
                                 alpha: float = 5.0) -> jax.Array:
    """frames: [T, B, H, W, C]; motion_vectors: [T-1, B, H, W, 2] or None.
    → scalar instability (0 for T < 2, pert_loss.py:182-183)."""
    t = frames.shape[0]
    if t < 2:
        return jnp.float32(0.0)
    prev = frames[:-1]
    cur = frames[1:]
    if motion_vectors is not None:
        prev = jax.vmap(_warp)(prev, motion_vectors)
    diff = jnp.abs(cur.astype(jnp.float32) - prev.astype(jnp.float32))
    weighted = jnp.exp(alpha * diff) - 1.0        # pert_loss.py:196
    return jnp.mean(weighted.reshape(t - 1, -1).mean(axis=1))
