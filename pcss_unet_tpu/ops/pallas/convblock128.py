"""NHWC-native fused ConvBlock kernel for the 128-channel stages.

The channels-major kernel (ops/pallas/convblock.py) wins the ≤64-channel
stages but only ties XLA at Cin=128 — with 128 channels the NHWC lane
axis is already exactly full, so the layout flip buys nothing and its
transposes cost.  This kernel keeps the native NHWC layout (C on lanes,
W·k on sublanes) and fuses the WHOLE block —

    LeakyReLU(conv1×1(LeakyReLU(conv3×3(x, W1) + b1), W2) + b2)

— per row band: the 9 taps are MXU matmuls ``[k·W, C] @ [C, C]`` (K=N=128,
one perfect MXU tile), the hidden activation h never leaves VMEM, and the
1×1 conv is one more matmul before a single bf16 store.  The XLA
composition reads/writes the full [H,W,128] hidden tensor through HBM and
runs the small-channel convs ~6× over the traffic bound
(docs/BENCHMARKS.md).

Vertical halo: 3-band prev/cur/next BlockSpec trick; horizontal taps are
W-axis shifts with zero columns (SAME padding).  Forward/inference only.
Requires Cin == Cmid (the block's 3×3 conv keeps channels — reference
DoubleConv, Unetmodel.py:17-33), C a multiple of 128, Cout ≤ Cmid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcss_unet_tpu.ops.pallas.taps import conv3x3_band_taps


def _kernel(prev_ref, cur_ref, next_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *, k_rows: int, negative_slope: float,
            interpret: bool = False):
    b = pl.program_id(1)
    nbands = pl.num_programs(1)
    w = cur_ref.shape[2]
    # interpret mode inlines these dots as XLA CPU ops; the CPU runtime's
    # DotThunk lacks bf16×bf16→f32 at some shapes → compute in f32 there
    dt = jnp.float32 if interpret else cur_ref.dtype

    prev_last = prev_ref[0, k_rows - 1:, :, :]
    next_first = next_ref[0, :1, :, :]
    prev_last = jnp.where(b == 0, jnp.zeros_like(prev_last), prev_last)
    next_first = jnp.where(b == nbands - 1, jnp.zeros_like(next_first),
                           next_first)
    ext = jnp.concatenate([prev_last, cur_ref[0], next_first], axis=0)

    acc = conv3x3_band_taps(ext, w1_ref, k_rows, jnp.float32, cast=dt)
    h = acc + b1_ref[0]
    h = jnp.where(h >= 0, h, h * negative_slope).astype(dt)
    out = jax.lax.dot_general(
        h, w2_ref[:].astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + b2_ref[0]
    out = jnp.where(out >= 0, out, out * negative_slope)
    cout = w2_ref.shape[1]
    out_ref[0] = out.reshape(k_rows, w, cout).astype(out_ref.dtype)


def pick_k_rows_128(h: int, w: int, c: int, cout: int) -> int | None:
    """Largest VMEM-fitting band height, or None if the shape doesn't meet
    the kernel's constraints.  Weight blocks have constant index maps so
    the Pallas pipeline keeps a single buffer for them."""
    if c % 128 or cout % 64:
        return None
    budget = 14 * 1024 * 1024
    for k in (8, 4, 2):
        if h % k or (k * w) % 16:
            continue
        bands = 3 * 2 * k * w * c * 2
        ext = (k + 2) * w * c * 2
        taps = 2 * k * w * c * 2
        acc = k * w * c * 4
        hbuf = k * w * c * 2
        acc2 = k * w * cout * 4
        out = 2 * k * w * cout * 2
        wgt = (9 * c * c + c * cout) * 2
        if bands + ext + taps + acc + hbuf + acc2 + out + wgt <= budget:
            return k
    return None


@functools.partial(jax.jit, static_argnames=("k_rows", "negative_slope",
                                             "interpret"))
def fused_block128_nhwc(x: jax.Array, w1: jax.Array, b1: jax.Array,
                        w2: jax.Array, b2: jax.Array, *, k_rows: int = 4,
                        negative_slope: float = 0.2,
                        interpret: bool = False) -> jax.Array:
    """x [N,H,W,C] bf16, w1 [9,C,C] (tap = dy·3+dx), b1 [C] f32,
    w2 [C,Cout], b2 [Cout] f32 → [N,H,W,Cout] in x.dtype."""
    n, h, w, c = x.shape
    cout = w2.shape[1]
    assert c % 128 == 0 and h % k_rows == 0 and (k_rows * w) % 16 == 0
    bands = h // k_rows
    grid = (n, bands)

    def band_spec(off):
        return pl.BlockSpec(
            (1, k_rows, w, c),
            lambda bi, i, o=off: (bi, jnp.clip(i + o, 0, bands - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, k_rows=k_rows,
                          negative_slope=negative_slope,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        grid=grid,
        in_specs=[band_spec(-1), band_spec(0), band_spec(+1),
                  full((9, c, c)), full((1, c)),
                  full((c, cout)), full((1, cout))],
        out_specs=pl.BlockSpec((1, k_rows, w, cout),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, w1, b1[None], w2, b2[None])
    return out


def pack_block128_params(params: dict, dtype=jnp.bfloat16):
    """Flax folded-BN ConvBlock param subtree → operand pack."""
    import numpy as np

    ka = np.asarray(params["conv_a"]["kernel"], np.float32)  # [3,3,C,C] HWIO
    kb = np.asarray(params["conv_b"]["kernel"], np.float32)  # [1,1,C,Cout]
    w1 = jnp.asarray(ka.reshape(9, ka.shape[2], ka.shape[3]), dtype)
    b1 = jnp.asarray(params["conv_a"]["bias"], jnp.float32)
    w2 = jnp.asarray(kb[0, 0], dtype)
    b2 = jnp.asarray(params["conv_b"]["bias"], jnp.float32)
    return w1, b1, w2, b2
