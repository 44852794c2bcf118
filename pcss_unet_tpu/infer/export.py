"""Portable deployment artifacts: serialize the inference function to
StableHLO via ``jax.export``.

The paper's deployment story ends in an engine-embedded network
(25MB→2.5MB→1.5MB artifacts, paper.md:143); the reference ships only torch
checkpoints.  Here the *whole compiled computation* — folded-BN bf16
forward with standardization, scrub and clip baked in — exports to one
self-contained blob that any StableHLO consumer (JAX on another host, XLA
AOT, IREE-class runtimes) can run without this package or the Python model
code."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_inference(engine, height: int, width: int, batch: int = 1,
                     platforms: tuple[str, ...] = ("tpu", "cpu")) -> bytes:
    """Serialize ``engine``'s padded forward for a fixed frame shape.

    The exported callable maps [batch, height, width, 4] float32 →
    [batch, height, width, 1] float32 in [0, 1]; height/width must be
    multiples of the engine's pad_multiple (pad on the host first)."""
    if height % engine.pad_multiple or width % engine.pad_multiple:
        raise ValueError(f"export shape must be ×{engine.pad_multiple}-aligned")
    params = engine.params
    batch_stats = engine.batch_stats

    def fwd(frames):
        # plain graph: the fused posture embeds Pallas TPU custom calls,
        # which neither lower for non-TPU platforms nor honor the promise
        # of a self-contained StableHLO blob — export stays portable
        return engine._forward(params, batch_stats, frames, plain=True)

    spec = jax.ShapeDtypeStruct((batch, height, width, 4), jnp.float32)
    exported = jax_export.export(jax.jit(fwd), platforms=list(platforms))(spec)
    return exported.serialize()


def load_exported(blob: bytes):
    """→ callable(frames) from a serialized artifact."""
    exported = jax_export.deserialize(blob)
    return exported.call


def save_exported(engine, path: str, height: int, width: int,
                  batch: int = 1, platforms=("tpu", "cpu")) -> int:
    blob = export_inference(engine, height, width, batch, tuple(platforms))
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)
