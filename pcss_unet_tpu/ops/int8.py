"""Dynamic int8 convolution for the MXU-bound serving path.

v5e's MXU runs int8×int8→int32 at 2× the bf16 rate (measured 1.67× on the
512-channel decoder conv including quantize/dequantize overhead —
docs/BENCHMARKS.md "int8 serving").  This module implements the standard
symmetric dynamic scheme:

- activations: one per-tensor scale, ``max|x|/127``, computed per forward
  (no calibration pass, robust to the folded-BN activation ranges),
- weights: per-output-channel scales (the per-channel spread after BN
  folding is exactly why per-tensor weight scales would hurt),
- accumulation in int32, dequantize ``acc · (a_scale · w_scale[oc])``.

Forward/serving only; training and the parity paths keep full precision.
No reference equivalent (the reference serves fp32/fp16 torch,
paper.md:143); this is deployment capability beyond it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def quantize_tensor_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-tensor int8: → (q [int8], scale [] f32)."""
    scale = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def quantize_kernel_int8(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 for an HWIO conv kernel:
    → (q [kh,kw,Cin,Cout] int8, scales [Cout] f32)."""
    scales = (jnp.max(jnp.abs(kernel), axis=(0, 1, 2)).astype(jnp.float32)
              / 127.0 + 1e-12)
    q = jnp.clip(jnp.round(kernel.astype(jnp.float32) / scales),
                 -127, 127).astype(jnp.int8)
    return q, scales


def dynamic_int8_conv(x: jax.Array, kernel: jax.Array,
                      bias: jax.Array | None = None,
                      out_dtype=None) -> jax.Array:
    """SAME-padded NHWC conv with both operands dynamically quantized to
    int8; dequantizes in fp32 and returns ``out_dtype`` (default: x.dtype,
    so a bf16 network keeps bf16 intermediates — materializing fp32
    activations would hand the MXU win straight back to HBM).  Zero padding
    is exact under symmetric quantization (zero point 0)."""
    out_dtype = x.dtype if out_dtype is None else out_dtype
    xq, a_scale = quantize_tensor_int8(x)
    kq, w_scales = quantize_kernel_int8(kernel)
    acc = lax.conv_general_dilated(
        xq, kq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (a_scale * w_scales)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
