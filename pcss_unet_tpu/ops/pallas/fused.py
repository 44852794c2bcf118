"""Pallas TPU kernels for the bandwidth-bound edges of the network.

Two fusions that bracket every inference call (SURVEY.md §7 step 7):

- ``fused_scrub_standardize`` — NaN/Inf scrub (inference.py:171-173) +
  per-channel standardization ((x−μ)/(σ+1e-8), setdata.py:316) + bf16 cast
  in ONE pass over the frame.  One HBM read + one write instead of three
  kernel round-trips if XLA declines to fuse across the cast.
- ``fused_shuffle_sigmoid`` — the model head's pixel-shuffle reconstruction
  + sigmoid (Unetmodel.py:147-148) in one pass: reads the [H/2, W/2, 4]
  head output, writes the [H, W, 1] mask.

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


def _shuffle_sigmoid_kernel(x_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)     # [block, W2 * 4]
    rows, wc = x.shape
    w2 = wc // 4
    x = x.reshape(rows, w2, 2, 2)        # [..., dy, dx] torch channel order
    # out rows interleave dy: out[2r + dy, 2c + dx] = x[r, c, dy*2+dx]
    x = x.transpose(0, 2, 1, 3)          # [rows, dy, W2, dx]
    out = jax.nn.sigmoid(x.reshape(rows * 2, w2 * 2))
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_shuffle_sigmoid(x: jax.Array, block_rows: int = 64,
                          interpret: bool = False) -> jax.Array:
    """Head fusion: x [N, H2, W2, 4] → sigmoid(pixel_shuffle(x)) as
    [N, 2·H2, 2·W2, 1] float32 (Unetmodel.py:147-148).

    NOTE: current Mosaic rejects the lane-interleaving shape cast this needs
    ("infer-vector-layout: unsupported shape cast"), so the compiled TPU path
    is unavailable — the kernel is interpreter-validated and the model keeps
    the XLA composition (which fuses this pattern adequately).  Revisit when
    Mosaic grows strided lane stores."""
    n, h2, w2, c = x.shape
    assert c == 4, "head emits out_ch*r^2 = 4 channels"
    rows = n * h2
    x2 = x.reshape(rows, w2 * 4)
    block_rows = min(block_rows, rows)
    grid = (pl.cdiv(rows, block_rows),)
    out = pl.pallas_call(
        _shuffle_sigmoid_kernel,
        out_shape=jax.ShapeDtypeStruct((rows * 2, w2 * 2), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, w2 * 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows * 2, w2 * 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2)
    return out.reshape(n, h2 * 2, w2 * 2, 1)
