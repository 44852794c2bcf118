"""Per-stage A/B: fused Pallas ConvBlock kernel vs the XLA composition.

Benchmarks the network's small-channel 544×960 stages (the reference net at
1080p after pixel-unshuffle; BN folded so each block is
conv3×3+bias+LeakyReLU → conv1×1+bias+LeakyReLU).  Dependency-chained scan
harness per docs/BENCHMARKS.md "Measurement discipline"; numbers include
the NHWC↔channels-major transposes the fused path needs.

Prints one JSON line per (stage, impl).  Run on TPU: `python
scripts/bench_convblock.py`.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

from pcss_unet_tpu.ops.pallas.convblock import (
    fused_conv_block_nhwc, pack_convblock_params,
)

SCAN_LEN = 32

# (name, Cin, Cmid, Cout, H, W) — the ≤64-channel stages at 1080p, plus the
# wider 128-channel neighbours (fused only if they measure a win)
STAGES = [
    ("enc_0", 16, 16, 64, 544, 960),
    ("dec_final", 64, 64, 16, 544, 960),
    ("dec_2@272x480", 64, 64, 64, 272, 480),
    ("enc_1", 64, 64, 128, 272, 480),
    ("dec_2_real", 128, 128, 64, 272, 480),
]


def xla_block(x, params, slope=0.2):
    a = jax.lax.conv_general_dilated(
        x, params["conv_a"]["kernel"].astype(x.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a = nn.leaky_relu(a + params["conv_a"]["bias"].astype(x.dtype),
                      negative_slope=slope)
    b = jax.lax.conv_general_dilated(
        a, params["conv_b"]["kernel"].astype(x.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return nn.leaky_relu(b + params["conv_b"]["bias"].astype(x.dtype),
                         negative_slope=slope)


def timed(fn, x):
    @jax.jit
    def stream(x):
        def body(carry, _):
            out = fn(x + (carry * 1e-8).astype(x.dtype))
            return jnp.mean(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN_LEN)
        return acc

    float(stream(x))  # compile + warm
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(stream(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / SCAN_LEN * 1000  # ms per pass


def main():
    rng = np.random.default_rng(0)
    for name, cin, cmid, cout, h, w in STAGES:
        params = {
            "conv_a": {
                "kernel": jnp.asarray(rng.standard_normal(
                    (3, 3, cin, cmid)).astype(np.float32) * 0.1),
                "bias": jnp.asarray(rng.standard_normal(cmid).astype(
                    np.float32) * 0.1),
            },
            "conv_b": {
                "kernel": jnp.asarray(rng.standard_normal(
                    (1, 1, cmid, cout)).astype(np.float32) * 0.1),
                "bias": jnp.asarray(rng.standard_normal(cout).astype(
                    np.float32) * 0.1),
            },
        }
        x = jnp.asarray(rng.standard_normal((1, h, w, cin)), jnp.bfloat16)
        w1, b1, w2, b2 = pack_convblock_params(params)
        ms_xla = timed(functools.partial(xla_block, params=params), x)
        ms_fused = timed(
            lambda t: fused_conv_block_nhwc(t, w1, b1, w2, b2), x)
        ms_stack = timed(
            lambda t: fused_conv_block_nhwc(t, w1, b1, w2, b2,
                                            stack_taps=True), x)
        ms_accs = timed(
            lambda t: fused_conv_block_nhwc(t, w1, b1, w2, b2,
                                            acc_shift=True), x)
        print(json.dumps({
            "stage": name, "shape": f"{h}x{w}x{cin}->{cmid}->{cout}",
            "xla_ms": round(ms_xla, 3), "fused_ms": round(ms_fused, 3),
            "stack_taps_ms": round(ms_stack, 3),
            "acc_shift_ms": round(ms_accs, 3),
            "speedup_best": round(
                ms_xla / min(ms_fused, ms_stack, ms_accs), 2),
        }))


if __name__ == "__main__":
    main()
