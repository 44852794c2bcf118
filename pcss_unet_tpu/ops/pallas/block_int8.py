"""Whole-block int8 Pallas kernel: both convs of a folded-BN ConvBlock on
the int8 MXU, quantization entirely in-register, bf16 at every boundary.

Lessons this kernel is built on (docs/BENCHMARKS.md "int8 serving"):

- XLA's int8 conv beats bf16 ~1.5× but a *per-conv* Pallas int8 kernel
  loses end-to-end: the custom-call boundary breaks XLA's quantize/dequant
  fusion chains, and an int8 XLA op adjacent to a custom call triggers a
  pathological layout interaction (69 ms/frame).
- The NHWC-native bf16 block kernel (convblock128.py) integrates cleanly:
  bf16 in, bf16 out, nothing for XLA to re-layout.

So: fuse the ENTIRE block — per-band quantize → 9 int8 tap matmuls →
dequant+bias+LeakyReLU → re-quantize → int8 1×1 matmul → dequant+bias+
LeakyReLU → one bf16 store.  No int8 tensor ever crosses the kernel
boundary, the hidden activation never leaves VMEM, and the 3×3 conv runs
at the int8 MXU rate.  Weights are pre-quantized per output channel
(symmetric); activations get one dynamic scale per row band per conv —
strictly finer than the XLA path's per-tensor scales.

Fits the 512-channel stages (dec_1 512→512→128, enc_3 512→512→1024 at
1080p).  The 1024-channel dec_0 does NOT fit: its 3×3 weights alone are
9.4 MB of VMEM and tiling Co would orphan the fused 1×1.  Forward only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcss_unet_tpu.ops.pallas.taps import conv3x3_band_taps


def _quant(v, scale):
    return jnp.clip(jnp.round(v / scale), -127, 127).astype(jnp.int8)


def _kernel(prev_ref, cur_ref, next_ref, w1_ref, s1_ref, b1_ref,
            w2_ref, s2_ref, b2_ref, out_ref, *, k_rows: int,
            negative_slope: float):
    b = pl.program_id(1)
    nbands = pl.num_programs(1)
    w = cur_ref.shape[2]

    # row-granular halo: prev/next are single rows (a whole-band halo
    # fetch would double-buffer 3 full bands of VMEM for one used row)
    prev_row = prev_ref[0]                       # [1, W, C]
    next_row = next_ref[0]
    prev_row = jnp.where(b == 0, jnp.zeros_like(prev_row), prev_row)
    next_row = jnp.where(b == nbands - 1, jnp.zeros_like(next_row),
                         next_row)
    cur = cur_ref[0]                             # [k, W, C]

    a1 = (jnp.maximum(jnp.max(jnp.abs(cur.astype(jnp.float32))),
                      jnp.maximum(
                          jnp.max(jnp.abs(prev_row.astype(jnp.float32))),
                          jnp.max(jnp.abs(next_row.astype(jnp.float32)))))
          / 127.0 + 1e-12)
    extq = jnp.concatenate(
        [_quant(prev_row.astype(jnp.float32), a1),
         _quant(cur.astype(jnp.float32), a1),
         _quant(next_row.astype(jnp.float32), a1)], axis=0)  # [k+2, W, C]

    acc = conv3x3_band_taps(extq, w1_ref, k_rows, jnp.int32)
    h = acc.astype(jnp.float32) * (a1 * s1_ref[0]) + b1_ref[0]
    h = jnp.where(h >= 0, h, h * negative_slope).astype(jnp.bfloat16)

    a2 = jnp.max(jnp.abs(h.astype(jnp.float32))) / 127.0 + 1e-12
    hq = _quant(h.astype(jnp.float32), a2)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc2.astype(jnp.float32) * (a2 * s2_ref[0]) + b2_ref[0]
    out = jnp.where(out >= 0, out, out * negative_slope)
    cout = w2_ref.shape[1]
    out_ref[0] = out.reshape(k_rows, w, cout).astype(out_ref.dtype)


def pick_k_rows_int8(h: int, w: int, c: int, cout: int) -> int | None:
    """Largest VMEM-fitting band height for the whole-block int8 kernel,
    or None if the shape doesn't meet its constraints."""
    if c % 128 or cout % 64:
        return None
    budget = 14 * 1024 * 1024
    wgt = 9 * c * c + c * cout                  # int8, single-buffered
    if wgt > 5 * 1024 * 1024:                   # dec_0-class: doesn't fit
        return None
    for k in (8, 4, 2):
        if h % k or (k * w) % 32:
            continue
        band = 2 * k * w * c * 2                # bf16 cur, double-buffered
        halo = 2 * 2 * w * c * 2                # two single-row specs
        extq = (k + 2) * w * c                  # int8
        taps = 2 * k * w * c                    # int8 shifted temporaries
        acc = k * w * c * 4
        hbuf = k * w * c * 2                    # bf16 hidden
        hq = k * w * c
        acc2 = k * w * cout * 4
        out = 2 * k * w * cout * 2
        if (band + halo + extq + taps + acc + hbuf + hq + acc2 + out
                + wgt <= budget):
            return k
    return None


@functools.partial(jax.jit, static_argnames=("k_rows", "negative_slope",
                                             "interpret"))
def fused_block_int8_nhwc(x: jax.Array, w1q: jax.Array, s1: jax.Array,
                          b1: jax.Array, w2q: jax.Array, s2: jax.Array,
                          b2: jax.Array, *, k_rows: int = 2,
                          negative_slope: float = 0.2,
                          interpret: bool = False) -> jax.Array:
    """x [N,H,W,C] bf16/f32; w1q [9,C,C] int8 with per-out-channel scales
    s1 [C] f32, b1 [C] f32; w2q [C,Cout] int8, s2 [Cout] f32, b2 [Cout]
    f32 → [N,H,W,Cout] in x.dtype."""
    n, h, w, c = x.shape
    cout = w2q.shape[1]
    assert c % 128 == 0 and h % k_rows == 0 and (k_rows * w) % 32 == 0
    bands = h // k_rows
    grid = (n, bands)

    cur_spec = pl.BlockSpec((1, k_rows, w, c),
                            lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)
    # single-row halo specs (block height 1 → the H index is a row index)
    prev_spec = pl.BlockSpec(
        (1, 1, w, c),
        lambda bi, i: (bi, jnp.clip(i * k_rows - 1, 0, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    next_spec = pl.BlockSpec(
        (1, 1, w, c),
        lambda bi, i: (bi, jnp.clip(i * k_rows + k_rows, 0, h - 1), 0, 0),
        memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, k_rows=k_rows,
                          negative_slope=negative_slope),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        grid=grid,
        in_specs=[prev_spec, cur_spec, next_spec,
                  full((9, c, c)), full((1, c)), full((1, c)),
                  full((c, cout)), full((1, cout)), full((1, cout))],
        out_specs=pl.BlockSpec((1, k_rows, w, cout),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, w1q, s1[None], b1[None], w2q, s2[None], b2[None])
    return out


def _kchunk_kernel(prev_ref, cur_ref, next_ref, w1_ref, s1_ref, b1_ref,
                   w2_ref, s2_ref, b2_ref, out_ref, acc_ref, *,
                   k_rows: int, negative_slope: float):
    b = pl.program_id(1)
    nbands = pl.num_programs(1)
    j = pl.program_id(2)
    nchunks = pl.num_programs(2)
    w = cur_ref.shape[2]

    prev_row = prev_ref[0]
    next_row = next_ref[0]
    prev_row = jnp.where(b == 0, jnp.zeros_like(prev_row), prev_row)
    next_row = jnp.where(b == nbands - 1, jnp.zeros_like(next_row),
                         next_row)
    cur = cur_ref[0]

    a1 = (jnp.maximum(jnp.max(jnp.abs(cur.astype(jnp.float32))),
                      jnp.maximum(
                          jnp.max(jnp.abs(prev_row.astype(jnp.float32))),
                          jnp.max(jnp.abs(next_row.astype(jnp.float32)))))
          / 127.0 + 1e-12)
    extq = jnp.concatenate(
        [_quant(prev_row.astype(jnp.float32), a1),
         _quant(cur.astype(jnp.float32), a1),
         _quant(next_row.astype(jnp.float32), a1)], axis=0)

    part = conv3x3_band_taps(extq, w1_ref, k_rows, jnp.int32)

    # fp32 accumulation across C chunks (each chunk has its own a1 scale)
    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += part.astype(jnp.float32) * (a1 * s1_ref[0])

    @pl.when(j == nchunks - 1)
    def _finalize():
        h = acc_ref[:] + b1_ref[0]
        h = jnp.where(h >= 0, h, h * negative_slope)
        a2 = jnp.max(jnp.abs(h)) / 127.0 + 1e-12
        hq = _quant(h, a2)
        acc2 = jax.lax.dot_general(
            hq, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc2.astype(jnp.float32) * (a2 * s2_ref[0]) + b2_ref[0]
        out = jnp.where(out >= 0, out, out * negative_slope)
        cout = w2_ref.shape[1]
        out_ref[0] = out.reshape(k_rows, w, cout).astype(out_ref.dtype)


def pick_kchunked(h: int, w: int, c: int, cout: int
                  ) -> tuple[int, int] | None:
    """(k_rows, c_chunk) for the contraction-chunked variant (dec_0-class
    1024-channel blocks whose full 3×3 weights exceed VMEM), or None."""
    if c % 256 or cout % 64:
        return None
    budget = 14 * 1024 * 1024
    for cchunk in (256, 128):
        if c % cchunk:
            continue
        for k in (4, 2):
            if h % k or (k * w) % 32:
                continue
            band = 2 * k * w * cchunk * 2
            halo = 2 * 2 * w * cchunk * 2
            extq = (k + 2) * w * cchunk
            taps = 2 * k * w * cchunk
            wgt1 = 2 * 9 * cchunk * c            # int8, double-buffered (j)
            accf = k * w * c * 4                 # fp32 scratch
            part = k * w * c * 4
            hq = k * w * c
            wgt2 = c * cout
            acc2 = k * w * cout * 4
            out = 2 * k * w * cout * 2
            if (band + halo + extq + taps + wgt1 + accf + part + hq
                    + wgt2 + acc2 + out <= budget):
                return k, cchunk
    return None


@functools.partial(jax.jit, static_argnames=("k_rows", "c_chunk",
                                             "negative_slope", "interpret"))
def fused_block_int8_kchunked(x: jax.Array, w1q: jax.Array, s1: jax.Array,
                              b1: jax.Array, w2q: jax.Array, s2: jax.Array,
                              b2: jax.Array, *, k_rows: int, c_chunk: int,
                              negative_slope: float = 0.2,
                              interpret: bool = False) -> jax.Array:
    """Contraction-chunked whole-block int8 kernel: like
    ``fused_block_int8_nhwc`` but the 3×3 contraction streams the input
    channels in ``c_chunk`` slices (grid dim, fp32 accumulation in VMEM
    scratch; per-chunk activation scales).  Fits Cin=1024 blocks."""
    n, h, w, c = x.shape
    cmid = w1q.shape[2]
    cout = w2q.shape[1]
    assert c % c_chunk == 0 and h % k_rows == 0 and (k_rows * w) % 32 == 0
    bands = h // k_rows
    nchunks = c // c_chunk
    grid = (n, bands, nchunks)

    cur_spec = pl.BlockSpec((1, k_rows, w, c_chunk),
                            lambda bi, i, j: (bi, i, 0, j),
                            memory_space=pltpu.VMEM)
    prev_spec = pl.BlockSpec(
        (1, 1, w, c_chunk),
        lambda bi, i, j: (bi, jnp.clip(i * k_rows - 1, 0, h - 1), 0, j),
        memory_space=pltpu.VMEM)
    next_spec = pl.BlockSpec(
        (1, 1, w, c_chunk),
        lambda bi, i, j: (bi, jnp.clip(i * k_rows + k_rows, 0, h - 1), 0, j),
        memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kchunk_kernel, k_rows=k_rows,
                          negative_slope=negative_slope),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        grid=grid,
        in_specs=[prev_spec, cur_spec, next_spec,
                  pl.BlockSpec((9, c_chunk, cmid),
                               lambda bi, i, j: (0, j, 0),
                               memory_space=pltpu.VMEM),
                  full((1, cmid)), full((1, cmid)),
                  full((cmid, cout)), full((1, cout)),
                  full((1, cout))],
        out_specs=pl.BlockSpec((1, k_rows, w, cout),
                               lambda bi, i, j: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k_rows * w, cmid), jnp.float32)],
        interpret=interpret,
    )(x, x, x, w1q, s1[None], b1[None], w2q, s2[None], b2[None])
    return out


def pack_block_int8_params(params: dict):
    """Flax folded-BN ConvBlock param subtree → quantized operand pack."""
    import numpy as np

    ka = np.asarray(params["conv_a"]["kernel"], np.float32)  # [3,3,C,C]
    kb = np.asarray(params["conv_b"]["kernel"], np.float32)  # [1,1,C,Cout]
    s1 = np.abs(ka).max(axis=(0, 1, 2)) / 127.0 + 1e-12
    w1q = np.clip(np.round(ka / s1), -127, 127).astype(np.int8)
    s2 = np.abs(kb[0, 0]).max(axis=0) / 127.0 + 1e-12
    w2q = np.clip(np.round(kb[0, 0] / s2), -127, 127).astype(np.int8)
    return (jnp.asarray(w1q.reshape(9, ka.shape[2], ka.shape[3])),
            jnp.asarray(s1, jnp.float32),
            jnp.asarray(params["conv_a"]["bias"], jnp.float32),
            jnp.asarray(w2q), jnp.asarray(s2, jnp.float32),
            jnp.asarray(params["conv_b"]["bias"], jnp.float32))
