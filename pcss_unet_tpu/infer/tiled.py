"""Scaled full-frame inference: spatial sharding and halo-tiled decomposition.

The reference has no tiled path at all — ``validate_direct`` is explicitly
non-tiled (main.py:583) and both CLIs are single-frame, single-GPU.  This is
the framework's analogue of sequence parallelism for a convolutional model
(SURVEY.md §2.12 SP row, §5 long-context):

1. ``infer_sharded`` — the TPU-native way: one jitted forward with the frame
   H-sharded over the mesh's 'spatial' axis.  XLA's SPMD partitioner inserts
   the conv halo exchanges over ICI automatically; numerics are identical to
   the single-device forward on the SAME padded frame (pinned in
   tests/test_sharding.py).  Note the sharded paths pad H up to a multiple
   of n_spatial·align rather than the engine's minimal ×16, so for frames
   whose H is not already so aligned, output rows within the model's
   receptive field of the bottom edge see a longer reflected border than
   ``engine(frames)`` would give them — a boundary-condition choice, not an
   approximation.  Preferred whenever the whole (padded) frame fits
   per-chip HBM ÷ spatial_parallel.

2. ``infer_tiled`` — explicit overlapping tiles with feathered blending, for
   frames exceeding HBM or when running many tiles as one MXU-friendly
   batch.  Tiles of ``tile×tile`` with a ``halo`` overlap run through the
   engine in bounded batches (``tile_batch``, so peak activation memory is
   per-chunk, not per-frame); seams are blended with a separable linear
   feather (weights sum to 1 everywhere by construction).  The blend is a
   bandwidth-bound scatter-accumulate with an on-device ``lax.scan``
   formulation (ops/pallas/blend.py — deliberately NOT a Pallas scatter,
   see its docstring) and a host-numpy fallback.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pcss_unet_tpu.infer.frame import InferenceEngine


def infer_sharded(engine: InferenceEngine, frames: np.ndarray, mesh) -> np.ndarray:
    """Full-frame inference with H sharded over the 'spatial' mesh axis and
    batch over 'data'.  When the engine posture carries Pallas/int8 kernels
    (which the auto-SPMD partitioner cannot split), dispatches to the
    shard_map halo path (``infer_sharded_halo``) so the kernels stay on;
    otherwise the plain jitted graph with XLA's automatic halo exchange."""
    kernels_on = (getattr(engine.model, "fused_inference", False)
                  or getattr(engine.model, "int8_inference", False))
    if kernels_on and getattr(engine.model, "spatial_window", "no") is None:
        return infer_sharded_halo(engine, frames, mesh)
    frames = np.asarray(frames, np.float32)
    squeeze = frames.ndim == 3
    if squeeze:
        frames = frames[None]
    b, h, w, _ = frames.shape
    n_sp = mesh.shape["spatial"]
    n_dp = mesh.shape.get("data", 1)
    # device_put needs every sharded axis divisible by its mesh axis: pad H
    # to a multiple of pad_multiple·n_sp, and only shard batch over 'data'
    # when it divides evenly (b=1 single-frame calls stay replicated).
    ph = (-h) % (engine.pad_multiple * n_sp)
    pw = (-w) % engine.pad_multiple
    if ph >= h:
        # frame too small to split n_sp ways (reflect-pad needs pad < H):
        # run single-device through the engine's own pad/crop path — this
        # keeps the engine's kernel posture and minimal ×16 padding, i.e.
        # plain single-device numerics rather than the sharded graph's
        out = engine(frames)
        return out[0] if squeeze else out
    if ph or pw:
        frames = np.pad(frames, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")
    bspec = "data" if n_dp > 1 and b % n_dp == 0 else None
    sharding = NamedSharding(mesh, P(bspec, "spatial"))
    x = jax.device_put(frames, sharding)
    # plain graph: the SPMD partitioner can't split a Pallas custom call
    out = np.asarray(engine.run_padded(x, plain=True))[:, :h, :w, :]
    return out[0] if squeeze else out


def infer_sharded_halo(engine: InferenceEngine, frames: np.ndarray, mesh,
                       halo: int | None = None) -> np.ndarray:
    """Spatially-sharded inference that KEEPS the Pallas/int8 kernel
    posture: each device runs the full kernel path on an aligned
    (shard + 2·halo)-row window of the frame (window mode — resizes use
    global coefficients) and emits its own rows.  With the default
    halo = spatial_halo(model), the result equals the single-device fused
    forward exactly (pinned in tests/test_sharding.py)."""
    from pcss_unet_tpu.models.unet import spatial_align, spatial_halo

    frames = np.asarray(frames, np.float32)
    squeeze = frames.ndim == 3
    if squeeze:
        frames = frames[None]
    # shard_h (hence every window start) must keep the model's pooling
    # alignment — 16 only covers depth <= 4 (models/unet.py:spatial_align)
    align = max(engine.pad_multiple, spatial_align(engine.model))
    if halo is None:
        halo = spatial_halo(engine.model)
    # (build_sharded_forward rounds halo up to the alignment itself)
    n_sp = mesh.shape["spatial"]
    n_dp = mesh.shape.get("data", 1)
    b, h, w, _ = frames.shape
    ph = (-h) % (align * n_sp)
    # W must keep the model's pooling alignment too: window mode has no
    # resize fixup, so a 16-aligned-but-not-2^depth-aligned width would
    # fail inside UNet.__call__ for depth >= 5 models
    pw = (-w) % align
    if ph >= h:
        # Frame too small to split n_sp ways (reflect-pad needs pad < H,
        # and a shard would be mostly padding anyway): run single-device
        # through the engine's own pad/crop path.
        out = engine(frames)
        return out[0] if squeeze else out
    if ph or pw:
        frames = np.pad(frames, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")
    shard_batch = n_dp > 1 and b % n_dp == 0
    fwd = engine.build_sharded_forward(mesh, halo, shard_batch)
    x = jax.device_put(frames, NamedSharding(
        mesh, P("data" if shard_batch else None)))
    out = fwd(engine.params, engine.batch_stats, x)
    out = np.asarray(out)[:, :h, :w, :]
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
    if stride <= 0:
        # stride 0 would crash range(); NEGATIVE stride is worse — it
        # silently plans only the last tile and the rest of the frame
        # blends to zero
        raise ValueError(f"tile ({tile}) must exceed the overlap "
                         f"({overlap} = 2*halo)")
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def infer_tiled(engine: InferenceEngine, frame: np.ndarray,
                tile: int = 512, halo: int = 32,
                blend: str = "auto", tile_batch: int = 16) -> np.ndarray:
    """Single frame [H, W, 4] → mask [H, W, 1] via overlapping tiles.

    Tiles run through the engine in batches of ``tile_batch`` (0 = all at
    once) — bounding peak activation memory at per-chunk rather than
    per-frame, which is the whole point of tiling a frame that itself
    exceeds HBM — then blend back with feathered weights.
    ``blend``: 'device' (default for 'auto': jitted scan, no host round
    trip of the full-res accumulators) or 'host' (numpy)."""
    if blend not in ("auto", "host", "device"):
        raise ValueError(f"unknown blend mode: {blend!r} "
                         "(expected auto | host | device)")
    if 2 * halo >= tile:
        raise ValueError(f"tile ({tile}) must exceed 2*halo ({2 * halo})")
    if tile % engine.pad_multiple:
        # run_padded takes already-aligned frames; an unaligned tile would
        # come back resized and break the blend's shape contract
        raise ValueError(f"tile ({tile}) must be a multiple of the "
                         f"engine's pad_multiple ({engine.pad_multiple})")
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

    n_tiles = len(tiles)
    tb = n_tiles if tile_batch <= 0 else min(tile_batch, n_tiles)
    pad_t = (-n_tiles) % tb
    if pad_t:  # equal chunks → ONE compiled forward shape
        tiles = np.concatenate(
            [tiles, np.zeros((pad_t, tile, tile, c), np.float32)])
    chunks = [engine.run_padded(jnp.asarray(tiles[i:i + tb]))
              for i in range(0, n_tiles + pad_t, tb)]
    outs = (chunks[0] if len(chunks) == 1
            else jnp.concatenate(chunks))[:n_tiles]  # [T, tile, tile, 1]

    # feathered accumulation (weights sum to 1 where tiles overlap exactly
    # `overlap`; frame borders renormalize to 1 via the norm division)
    wy = _feather_weights(tile, halo)
    wx = _feather_weights(tile, halo)
    w2d = np.outer(wy, wx).astype(np.float32)[..., None]  # [tile, tile, 1]
    offsets = np.array([(y, x) for y in ys for x in xs], np.int32)
    # the weight-normalization field depends only on host-known geometry:
    # build it once here instead of re-accumulating it on device per tile
    norm = np.zeros((fh, fw, 1), np.float32)
    for y, x in offsets:
        norm[y:y + tile, x:x + tile] += w2d
    if blend == "host":
        acc = np.zeros((fh, fw, 1), np.float32)
        outs_np = np.asarray(outs)
        for t, (y, x) in enumerate(offsets):
            acc[y:y + tile, x:x + tile] += outs_np[t] * w2d
        out = acc / np.maximum(norm, 1e-8)
    else:
        # device blend: jitted scan of dynamic-slice accumulates — no host
        # round-trip between the batched forward and the blend
        from pcss_unet_tpu.ops.pallas.blend import blend_tiles_device

        out = np.asarray(blend_tiles_device(outs, jnp.asarray(w2d),
                                            jnp.asarray(offsets), (fh, fw),
                                            norm=jnp.asarray(norm)))
    return out[:h, :w]
