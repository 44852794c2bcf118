"""Scaled full-frame inference: spatial sharding and halo-tiled decomposition.

The reference has no tiled path at all — ``validate_direct`` is explicitly
non-tiled (main.py:583) and both CLIs are single-frame, single-GPU.  This is
the framework's analogue of sequence parallelism for a convolutional model
(SURVEY.md §2.12 SP row, §5 long-context):

1. ``infer_sharded`` — the TPU-native way: one jitted forward with the frame
   H-sharded over the mesh's 'spatial' axis.  XLA's SPMD partitioner inserts
   the conv halo exchanges over ICI automatically; numerics are identical to
   single-device (proven in tests/test_sharding.py).  Preferred whenever the
   whole (padded) frame fits per-chip HBM ÷ spatial_parallel.

2. ``infer_tiled`` — explicit overlapping tiles with feathered blending, for
   frames exceeding HBM or when running many tiles as one MXU-friendly
   batch.  Tiles of ``tile×tile`` with a ``halo`` overlap are batched through
   the engine in one forward; seams are blended with a separable linear
   feather (weights sum to 1 everywhere by construction).  The blend is a
   bandwidth-bound elementwise op with a Pallas fused kernel
   (ops/pallas/blend.py) and a jnp fallback.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pcss_unet_tpu.infer.frame import InferenceEngine, pad_to_multiple


def infer_sharded(engine: InferenceEngine, frames: np.ndarray, mesh) -> np.ndarray:
    """Full-frame inference with H sharded over the 'spatial' mesh axis and
    batch over 'data'."""
    frames = np.asarray(frames, np.float32)
    squeeze = frames.ndim == 3
    if squeeze:
        frames = frames[None]
    padded, (h, w) = pad_to_multiple(frames, engine.pad_multiple)
    sharding = NamedSharding(mesh, P("data", "spatial"))
    x = jax.device_put(padded, sharding)
    # plain graph: the SPMD partitioner can't split a Pallas custom call
    out = np.asarray(engine.run_padded(x, plain=True))[:, :h, :w, :]
    return out[0] if squeeze else out


def _feather_weights(tile: int, halo: int, dtype=np.float32) -> np.ndarray:
    """1-D feather: 1 in the interior, linear ramp across the full overlap
    region (2·halo) at each edge, so two adjacent tiles' ramps sum to
    exactly 1 everywhere in their shared strip."""
    w = np.ones(tile, dtype)
    ramp_len = min(2 * halo, tile // 2)
    if ramp_len > 0:
        ramp = (np.arange(1, ramp_len + 1, dtype=dtype)) / (ramp_len + 1)
        w[:ramp_len] = ramp
        w[-ramp_len:] = ramp[::-1]
    return w


def plan_tiles(size: int, tile: int, overlap: int) -> list[int]:
    """Start offsets covering [0, size) with ``overlap`` shared pixels;
    the last tile is right-aligned so every pixel is covered exactly."""
    if tile >= size:
        return [0]
    stride = tile - overlap
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def infer_tiled(engine: InferenceEngine, frame: np.ndarray,
                tile: int = 512, halo: int = 32,
                blend: str = "auto") -> np.ndarray:
    """Single frame [H, W, 4] → mask [H, W, 1] via overlapping tiles.

    All tiles run as ONE batched forward (MXU-friendly), then are blended
    back with feathered weights."""
    frame = np.asarray(frame, np.float32)
    h, w, c = frame.shape
    pad_h = max(0, tile - h)
    pad_w = max(0, tile - w)
    if pad_h or pad_w:
        frame = np.pad(frame, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    fh, fw, _ = frame.shape
    overlap = 2 * halo
    ys = plan_tiles(fh, tile, overlap)
    xs = plan_tiles(fw, tile, overlap)
    tiles = np.stack([frame[y:y + tile, x:x + tile] for y in ys for x in xs])

    outs = engine.run_padded(jnp.asarray(tiles))          # [T, tile, tile, 1]

    # feathered accumulation (weights sum to 1 where tiles overlap exactly
    # `overlap`; frame borders renormalize to 1 via the norm division)
    wy = _feather_weights(tile, halo)
    wx = _feather_weights(tile, halo)
    w2d = np.outer(wy, wx).astype(np.float32)[..., None]  # [tile, tile, 1]
    offsets = np.array([(y, x) for y in ys for x in xs], np.int32)
    if blend == "host":
        acc = np.zeros((fh, fw, 1), np.float32)
        norm = np.zeros((fh, fw, 1), np.float32)
        outs_np = np.asarray(outs)
        for t, (y, x) in enumerate(offsets):
            acc[y:y + tile, x:x + tile] += outs_np[t] * w2d
            norm[y:y + tile, x:x + tile] += w2d
        out = acc / np.maximum(norm, 1e-8)
    else:
        # device blend: jitted scan of dynamic-slice accumulates — no host
        # round-trip between the batched forward and the blend
        from pcss_unet_tpu.ops.pallas.blend import blend_tiles_device

        out = np.asarray(blend_tiles_device(outs, jnp.asarray(w2d),
                                            jnp.asarray(offsets), (fh, fw)))
    return out[:h, :w]
