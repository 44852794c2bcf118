"""Pallas int8 3×3 conv for the large-channel MXU-bound stages.

XLA's int8 conv lowering runs well below v5e's 394-TOPS int8 peak on the
512/1024-channel decoder convs, and composing it with a separate dynamic-
quantize pass costs extra HBM round-trips and an int8 relayout at the
custom-call boundary.  This kernel does the whole serving pipeline in ONE
pass — bf16 in, int8 matmuls, bf16 out:

- each row band is quantized **in-register** with its own scale
  (max|band|/127): no global abs-max pre-pass over the frame, no int8
  relayout, and per-band scales are strictly finer-grained than the
  per-tensor scheme they replace,
- the 9 taps are int8 matmuls ``[k·W, C] @ [C, Cot]`` accumulated in int32
  VMEM; grid (batch, bands, co_tiles) with co fastest so each x band is
  fetched once and reused across all Co tiles,
- the vertical halo is the 3-band prev/cur/next BlockSpec trick
  (ops/pallas/convblock.py); horizontal taps are W-axis shifts with zero
  columns (SAME padding; exact under symmetric quantization),
- the dequantize epilogue (acc · a_scale·w_scale[co] + bias, optional
  LeakyReLU) runs in-register before one bf16 store — the XLA path
  materializes the int32 accumulator to HBM first.

Layout: NHWC with C on lanes (C, Co multiples of 128; k·W a multiple of
32 for the int8 (32,128) tile).  Forward/serving only.

**Measured verdict — NOT wired into the model.**  Standalone the kernel
beats XLA's int8 conv (3.30 vs 3.72 ms at the 512-ch decoder shape,
179 vs 153 TOPS at the 1024-ch shape; `scripts/bench_int8_conv.py`), but
end-to-end the model is FASTER with plain XLA int8 convs (49.0 vs
42.4 fps at 1080p): inside the full graph XLA fuses the quantize/dequant/
activation chains across neighbouring ops, and a custom-call boundary
breaks exactly those fusions.  The kernel stays as the measured-and-tested
reference point (docs/BENCHMARKS.md "int8 serving") — revisit if Mosaic
grows output-fusion hooks or if a whole-block (conv+act+conv) variant
amortizes the boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(prev_ref, cur_ref, next_ref, w_ref, scale_ref, bias_ref,
                 out_ref, *, k_rows: int, negative_slope: float | None):
    b = pl.program_id(1)
    nbands = pl.num_programs(1)
    w = cur_ref.shape[2]

    prev_last = prev_ref[0, k_rows - 1:, :, :]       # [1, W, C] bf16
    next_first = next_ref[0, :1, :, :]
    prev_last = jnp.where(b == 0, jnp.zeros_like(prev_last), prev_last)
    next_first = jnp.where(b == nbands - 1, jnp.zeros_like(next_first),
                           next_first)
    ext = jnp.concatenate([prev_last, cur_ref[0], next_first], axis=0)

    # per-band dynamic quantization, in-register (no HBM pre-pass)
    a_scale = (jnp.max(jnp.abs(ext.astype(jnp.float32))) / 127.0 + 1e-12)
    extq = jnp.clip(jnp.round(ext.astype(jnp.float32) / a_scale),
                    -127, 127).astype(jnp.int8)

    cot = w_ref.shape[2]
    acc = jnp.zeros((k_rows * w, cot), jnp.int32)
    zcol = jnp.zeros((k_rows, 1, extq.shape[2]), jnp.int8)
    for dy in range(3):
        rows = extq[dy: dy + k_rows]                 # [k, W, C] int8
        for dx in (-1, 0, 1):
            if dx == 0:
                tap = rows
            elif dx == 1:
                tap = jnp.concatenate([rows[:, 1:, :], zcol], axis=1)
            else:
                tap = jnp.concatenate([zcol, rows[:, :-1, :]], axis=1)
            acc += jax.lax.dot_general(
                tap.reshape(k_rows * w, -1), w_ref[dy * 3 + dx + 1],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (a_scale * scale_ref[0]) + bias_ref[0]
    if negative_slope is not None:
        out = jnp.where(out >= 0, out, out * negative_slope)
    out_ref[0] = out.reshape(k_rows, w, cot).astype(out_ref.dtype)


def pick_tiles(h: int, w: int, c: int, co: int) -> tuple[int, int] | None:
    """(k_rows, co_tile) satisfying the kernel's layout constraints within
    the scoped-VMEM budget, or None → caller falls back to the XLA conv.
    Budget mirrors ops/pallas/convblock.py:_pick_k_rows's 14 MB headroom."""
    if c % 128 or co % 128:
        return None
    budget = 14 * 1024 * 1024
    for cot in (256, 128):
        if co % cot:
            continue
        for k in (8, 4, 2):
            if h % k or (k * w) % 32:
                continue
            bands = 3 * 2 * k * w * c * 2      # bf16 bands, double-buffered
            ext = (k + 2) * w * c * 2          # bf16 concat
            extq = (k + 2) * w * c             # int8 quantized copy
            taps = 2 * k * w * c               # shifted int8 temporaries
            wgt = 2 * 9 * c * cot
            acc = k * w * cot * 4
            out = 2 * k * w * cot * 2
            if bands + ext + extq + taps + wgt + acc + out <= budget:
                return k, cot
    return None


@functools.partial(jax.jit, static_argnames=("k_rows", "co_tile",
                                             "negative_slope", "out_dtype",
                                             "interpret"))
def conv3x3_int8_nhwc(x: jax.Array, wq: jax.Array, w_scales: jax.Array,
                      bias: jax.Array, *, k_rows: int = 4,
                      co_tile: int = 256,
                      negative_slope: float | None = None,
                      out_dtype=jnp.bfloat16,
                      interpret: bool = False) -> jax.Array:
    """x [N,H,W,C] bf16/float, wq [9,C,Co] int8 (tap = dy·3+dx), w_scales
    [Co] f32 (per-output-channel weight dequant factors), bias [Co] f32 →
    [N,H,W,Co] ``out_dtype``.  Activations are quantized per row band
    inside the kernel.

    Requires C % 128 == 0, Co % co_tile == 0, H % k_rows == 0 and
    (k_rows·W) % 32 == 0 (see ``pick_tiles``).
    """
    n, h, w, c = x.shape
    co = wq.shape[2]
    assert c % 128 == 0 and co % co_tile == 0, (c, co, co_tile)
    assert h % k_rows == 0 and (k_rows * w) % 32 == 0, (h, k_rows, w)
    bands = h // k_rows
    grid = (n, bands, co // co_tile)

    def band_spec(off):
        return pl.BlockSpec(
            (1, k_rows, w, c),
            lambda bi, i, j, o=off: (bi, jnp.clip(i + o, 0, bands - 1), 0, 0),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_conv_kernel, k_rows=k_rows,
                          negative_slope=negative_slope),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), out_dtype),
        grid=grid,
        in_specs=[band_spec(-1), band_spec(0), band_spec(+1),
                  pl.BlockSpec((9, c, co_tile), lambda bi, i, j: (0, 0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, co_tile), lambda bi, i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, co_tile), lambda bi, i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, k_rows, w, co_tile),
                               lambda bi, i, j: (bi, i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, wq, w_scales[None], bias[None])
    return out
