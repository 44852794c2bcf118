"""Space-to-depth ConvBlock transform: exact rewrite + per-stage A/B bench.

The measured floor at the big-spatial stages (docs/BENCHMARKS.md per-layer
note) is that a 3×3 conv at ~512×1024 costs ~0.7 ms for ANY channel count
below ~128 — the MXU tiles K/N to 128 lanes, so a 16-channel conv wastes
7/8 of the array.  The space-to-depth transform (ROADMAP.md "shape-bound
convs") moves the block to a 4×-channel, ¼-spatial domain where the tiles
fill:

    y = B(x)                            B = conv3×3(W3)+b → LeakyReLU
                                            → conv1×1(W1)+b → LeakyReLU
    y = d2s( B'( s2d(x) ) )             B' = conv3×3(W3')+b' → LeakyReLU
                                            → conv1×1(W1')+b' → LeakyReLU

with W3' [3,3,4Cin,4Cmid] an EXACT re-indexing of W3 (each output subpixel
(di,dj) gathers the taps u,v of the original conv from block (p,q) subpixel
(si,sj) where 2p-2+si = di+u etc.), W1' the subpixel-block-diagonal embed
of W1, and biases tiled 4×.  LeakyReLU is elementwise so it commutes with
the permutation — the whole block stays exact (bf16: bit-exact, same
contraction lengths per output up to conv algorithm).

Padded-MXU arithmetic for a Cin=Cmid=16 stage at 512×1024:
  original : 9·128·128·512·1024 padded MACs  (K=N=16 → one 128 tile each)
  s2d (f=2): 9·128·128·256·512  padded MACs  (K=N=64 → one 128 tile each)
→ 4× fewer padded MACs for the same real work + two layout passes.

Prints one JSON line per (stage, impl).  Run on TPU:
`python scripts/bench_s2d.py`.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

SCAN_LEN = 32

# (name, Cin, Cmid, Cout, H, W)
# w16-trimmed net at 2K (1024×2048 input → 512×1024 half-res): the stages
# holding the measured shape-bound floor, + the reference (w64) net's
# 1080p small-channel stages for the headline path.
STAGES = [
    ("w16/enc_0@2K", 16, 16, 16, 512, 1024),
    ("w16/dec_2@2K", 32, 32, 16, 512, 1024),
    ("w16/dec_final@2K", 16, 16, 16, 512, 1024),
    ("w16/enc_1@2K", 16, 16, 32, 256, 512),
    ("w64/enc_0@1080p", 16, 16, 64, 544, 960),
    ("w64/dec_final@1080p", 64, 64, 16, 544, 960),
]


def s2d(x: jax.Array) -> jax.Array:
    """[B,H,W,C] → [B,H/2,W/2,4C], channel index (si·2+sj)·C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def d2s(x: jax.Array) -> jax.Array:
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def s2d_conv3x3_weights(w3: np.ndarray) -> np.ndarray:
    """[3,3,Cin,Cout] → [3,3,4Cin,4Cout] computing the SAME map in the
    s2d domain (exact re-indexing; structural zeros elsewhere)."""
    cin, cout = w3.shape[2], w3.shape[3]
    w = np.zeros((3, 3, 4 * cin, 4 * cout), w3.dtype)
    for di in range(2):
        for u in (-1, 0, 1):
            p = (di + u) // 2 + 1
            si = (di + u) % 2
            for dj in range(2):
                for v in (-1, 0, 1):
                    q = (dj + v) // 2 + 1
                    sj = (dj + v) % 2
                    ki = (si * 2 + sj) * cin
                    ko = (di * 2 + dj) * cout
                    w[p, q, ki:ki + cin, ko:ko + cout] += w3[u + 1, v + 1]
    return w


def s2d_conv1x1_weights(w1: np.ndarray) -> np.ndarray:
    """[1,1,Cin,Cout] → [1,1,4Cin,4Cout] subpixel-block-diagonal."""
    cin, cout = w1.shape[2], w1.shape[3]
    w = np.zeros((1, 1, 4 * cin, 4 * cout), w1.dtype)
    for s in range(4):
        w[0, 0, s * cin:(s + 1) * cin, s * cout:(s + 1) * cout] = w1[0, 0]
    return w


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


def s2d_params(params):
    return {
        "conv_a": {
            "kernel": jnp.asarray(s2d_conv3x3_weights(
                np.asarray(params["conv_a"]["kernel"]))),
            "bias": jnp.tile(params["conv_a"]["bias"], 4),
        },
        "conv_b": {
            "kernel": jnp.asarray(s2d_conv1x1_weights(
                np.asarray(params["conv_b"]["kernel"]))),
            "bias": jnp.tile(params["conv_b"]["bias"], 4),
        },
    }


def s2d_block(x, params_b, slope=0.2):
    return d2s(xla_block(s2d(x), params_b, slope))


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
    from pcss_unet_tpu.ops.pallas.convblock import (
        fused_conv_block_nhwc, pack_convblock_params,
    )

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
        pb = s2d_params(params)

        # correctness first (bf16 forward, fp32 compare)
        ref = np.asarray(xla_block(x, params), np.float32)
        got = np.asarray(s2d_block(x, pb), np.float32)
        err = float(np.abs(ref - got).max())

        row = {"stage": name, "shape": f"{h}x{w}x{cin}->{cmid}->{cout}",
               "max_err": err,
               "xla_ms": round(timed(
                   functools.partial(xla_block, params=params), x), 3),
               "s2d_ms": round(timed(
                   functools.partial(s2d_block, params_b=pb), x), 3)}
        if cin <= 64 and cmid <= 64:
            w1, b1, w2, b2 = pack_convblock_params(params)
            row["fused_ms"] = round(timed(
                lambda t: fused_conv_block_nhwc(t, w1, b1, w2, b2), x), 3)
        if 4 * cin <= 64 and 4 * cout <= 128:
            w1s, b1s, w2s, b2s = pack_convblock_params(pb)
            row["s2d_fused_ms"] = round(timed(
                lambda t: d2s(fused_conv_block_nhwc(
                    s2d(t), w1s, b1s, w2s, b2s)), x), 3)
        best_alt = min(v for k, v in row.items() if k.endswith("_ms")
                       and k != "xla_ms")
        row["speedup_vs_xla"] = round(row["xla_ms"] / best_alt, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
