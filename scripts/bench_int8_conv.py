"""A/B/C at the MXU-bound decoder conv shapes: bf16 conv vs XLA int8 conv
vs the Pallas int8 kernel (ops/pallas/conv3x3_int8.py), each as the full
serving pipeline (quantize + conv + dequant/LeakyReLU epilogue).

This is the evidence behind the int8 design verdicts in
docs/BENCHMARKS.md "int8 serving": XLA int8 beats bf16 ~1.5x; the Pallas
kernel beats XLA int8 standalone but LOSES end-to-end in the model (the
custom call breaks XLA's cross-op fusion), so the model keeps XLA convs.

Carry-chained scan harness per docs/BENCHMARKS.md "Measurement
discipline".  Run on TPU: `python scripts/bench_int8_conv.py`.
NOTE: Mosaic compiles of the kernel take minutes per shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from pcss_unet_tpu.ops.int8 import quantize_tensor_int8
from pcss_unet_tpu.ops.pallas.conv3x3_int8 import conv3x3_int8_nhwc, pick_tiles

SCAN_LEN = 32
SHAPES = [
    ("dec_1a", 272, 480, 512, 512),
    ("dec_0a", 136, 240, 1024, 1024),
    ("enc_3a", 68, 120, 512, 1024),
]


def timed(fn_of_x, x0):
    @jax.jit
    def stream(x):
        def body(carry, _):
            out = fn_of_x(x + (carry * 1e-12).astype(x.dtype))
            return jnp.mean(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN_LEN)
        return acc

    float(stream(x0))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(stream(x0))
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) / SCAN_LEN * 1000, 3)


def main():
    rng = np.random.default_rng(0)
    conv = lambda a, b, **kw: lax.conv_general_dilated(  # noqa: E731
        a, b, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)
    for name, h, w, c, co in SHAPES:
        gflop = 2 * 9 * h * w * c * co / 1e9
        x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.bfloat16)
        k_bf = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05,
                           jnp.bfloat16)
        ki = rng.integers(-127, 127, (3, 3, c, co)).astype(np.int8)
        kq, w9 = jnp.asarray(ki), jnp.asarray(ki.reshape(9, c, co))
        scales = jnp.asarray(np.full(co, 1e-3, np.float32))
        bias = jnp.asarray(np.zeros(co, np.float32))

        def bf16_path(t):
            out = conv(t, k_bf)
            return jnp.where(out >= 0, out, out * jnp.bfloat16(0.2))

        def xla_int8(t):
            tq, s = quantize_tensor_int8(t)
            acc = conv(tq, kq, preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * (scales * s) + bias
            return jnp.where(out >= 0, out, out * 0.2).astype(jnp.bfloat16)

        tiles = pick_tiles(h, w, c, co)

        def pallas_int8(t, tiles=tiles):
            kr, cot = tiles
            return conv3x3_int8_nhwc(t, w9, scales, bias, k_rows=kr,
                                     co_tile=cot, negative_slope=0.2)

        row = {"stage": name, "bf16_ms": timed(bf16_path, x),
               "xla_int8_ms": timed(xla_int8, x)}
        if tiles:
            row["pallas_int8_ms"] = timed(pallas_int8, x)
        row["gflop"] = round(gflop, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
