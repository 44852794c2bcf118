"""Pallas TPU kernels for the bandwidth-bound edges of the network.

Fusions that bracket every inference call (SURVEY.md §7 step 7):

- ``fused_scrub_standardize`` — NaN/Inf scrub (inference.py:171-173) +
  per-channel standardization ((x−μ)/(σ+1e-8), setdata.py:316) + bf16 cast
  in ONE pass over the frame.  One HBM read + one write instead of three
  kernel round-trips if XLA declines to fuse across the cast.
- ``fused_mask_to_u8`` — serving-path clip/scrub/×255/u8-quantize in one
  pass, halving device→host traffic for rendered masks.

(A head pixel-shuffle+sigmoid fusion was prototyped and removed: current
Mosaic rejects the lane-interleaving shape cast it needs, and XLA already
fuses that pattern adequately.  The fused ConvBlock kernel —
ops/pallas/convblock.py — is where the measured Pallas wins live.)

Grids are 1-D over row-blocks; W×C is the lane dimension (W is a multiple
of 64 and C is 4, so W·C is a multiple of the 128-lane requirement after
the flatten).  Both kernels are forward-only (inference path); training
keeps the XLA composition, which autodiffs.

Set ``interpret=True`` (or run on CPU) to use the Pallas interpreter —
that's how the CI tests pin kernel-vs-XLA equivalence without a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_available() -> bool:
    """Compiled Pallas kernels need a TPU — and the one computation actually
    runs on: honor an active ``jax.default_device`` pin (the test harness
    pins CPU while a TPU plugin owns the default backend)."""
    pinned = jax.config.jax_default_device
    if pinned is not None:
        return pinned.platform == "tpu"
    return jax.default_backend() == "tpu"


def _scrub_standardize_kernel(x_ref, mean_ref, inv_std_ref, out_ref):
    x = x_ref[:]
    # nan→0, +inf→1, −inf→0 (setdata.py:81-83 / inference.py:171-173)
    x = jnp.where(jnp.isnan(x), jnp.float32(0.0), x)
    x = jnp.where(jnp.isposinf(x), jnp.float32(1.0), x)
    x = jnp.where(jnp.isneginf(x), jnp.float32(0.0), x)
    out_ref[:] = ((x - mean_ref[:]) * inv_std_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_rows",
                                             "interpret"))
def fused_scrub_standardize(x: jax.Array, means: jax.Array, stds: jax.Array,
                            out_dtype=jnp.bfloat16, block_rows: int = 128,
                            interpret: bool = False) -> jax.Array:
    """x [N, H, W, C] float32 → scrubbed, standardized [N, H, W, C] in
    ``out_dtype``."""
    n, h, w, c = x.shape
    rows = n * h
    x2 = x.reshape(rows, w * c)
    mean_row = jnp.tile(means.astype(jnp.float32), w)[None, :]
    inv_std_row = jnp.tile(
        (1.0 / (stds.astype(jnp.float32) + 1e-8)), w)[None, :]
    block_rows = min(block_rows, rows)
    grid = (pl.cdiv(rows, block_rows),)
    out = pl.pallas_call(
        _scrub_standardize_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, w * c), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, w * c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, w * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, mean_row, inv_std_row)
    return out.reshape(n, h, w, c)


def _quantize_u8_kernel(x_ref, out_ref):
    x = jnp.clip(x_ref[:].astype(jnp.float32), 0.0, 1.0)
    x = jnp.where(jnp.isnan(x), jnp.float32(0.0), x)
    # Mosaic has no direct f32→u8 cast; round-trip through int32
    out_ref[:] = jnp.round(x * 255.0).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_mask_to_u8(x: jax.Array, block_rows: int = 256,
                     interpret: bool = False) -> jax.Array:
    """Serving-path quantization: float mask [N, H, W, 1] in [0,1] → uint8
    ×255 (infer.py:79-80) in one pass, fused with the output clip/scrub —
    halves the device→host traffic for rendered masks."""
    n, h, w, c = x.shape
    rows = n * h
    x2 = x.reshape(rows, w * c)
    block_rows = min(block_rows, rows)
    grid = (pl.cdiv(rows, block_rows),)
    out = pl.pallas_call(
        _quantize_u8_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, w * c), jnp.uint8),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, w * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, w * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2)
    return out.reshape(n, h, w, c)


