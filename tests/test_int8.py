"""Dynamic-int8 serving path (ops/int8.py + ConvBlock.int8_inference):
quantization math, conv equivalence at int8 tolerance, whole-model engine
path."""

import numpy as np
import jax
import jax.numpy as jnp

from pcss_unet_tpu.ops.int8 import (
    dynamic_int8_conv, quantize_kernel_int8, quantize_tensor_int8,
)


def test_quantize_roundtrip_error_bound(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    q, scale = quantize_tensor_int8(x)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * float(scale) - np.asarray(x))
    assert err.max() <= float(scale) / 2 + 1e-7  # round-to-nearest bound


def test_kernel_per_channel_scales(rng):
    k = rng.standard_normal((3, 3, 8, 4)).astype(np.float32)
    k[..., 2] *= 100.0  # one hot output channel must not crush the others
    q, scales = quantize_kernel_int8(jnp.asarray(k))
    assert scales.shape == (4,)
    deq = np.asarray(q, np.float32) * np.asarray(scales)
    for c in range(4):
        np.testing.assert_allclose(deq[..., c], k[..., c],
                                   atol=float(scales[c]) / 2 + 1e-7)


def test_int8_conv_close_to_float(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 32, 16)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = dynamic_int8_conv(x, k, b)
    # int8 tolerance: ~1% of the dynamic range per operand
    rel = np.abs(np.asarray(got - ref)) / (np.abs(np.asarray(ref)) + 1.0)
    assert rel.mean() < 0.02, rel.mean()


def test_pallas_int8_conv_kernel_exact(rng):
    """ops/pallas/conv3x3_int8.py ≡ an emulation of its per-band
    quantize-in-kernel scheme built from XLA int8 convs (interpreter mode;
    the same kernel compiles on TPU).  Pins the int32 accumulation, the
    band-halo handling, and the per-band scale semantics."""
    from jax import lax

    from pcss_unet_tpu.ops.pallas.conv3x3_int8 import (
        conv3x3_int8_nhwc, pick_tiles,
    )

    N, H, W, C, Co = 1, 8, 16, 128, 256
    x = rng.standard_normal((N, H, W, C)).astype(np.float32)
    k = rng.integers(-127, 127, (3, 3, C, Co)).astype(np.int8)
    w_scales = rng.random(Co).astype(np.float32) * 1e-2
    bias = rng.standard_normal(Co).astype(np.float32) * 0.1
    k_rows, co_tile = pick_tiles(H, W, C, Co)

    # emulation: quantize each row band (incl. its vertical halo rows,
    # zeros at the frame edges) with its own scale, then int8-conv it
    xp = np.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    ref = np.zeros((N, H, W, Co), np.float32)
    for b0 in range(0, H, k_rows):
        ext = xp[:, b0:b0 + k_rows + 2]              # [N, k+2, W, C]
        a = np.abs(ext).max() / 127.0 + 1e-12
        extq = np.clip(np.round(ext / a), -127, 127).astype(np.int8)
        acc = lax.conv_general_dilated(
            jnp.asarray(extq), jnp.asarray(k), (1, 1),
            [(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)        # [N, k, W, Co]
        band = np.asarray(acc, np.float32) * (a * w_scales) + bias
        ref[:, b0:b0 + k_rows] = np.where(band >= 0, band, band * 0.2)

    got = np.asarray(conv3x3_int8_nhwc(
        jnp.asarray(x), jnp.asarray(k.reshape(9, C, Co)),
        jnp.asarray(w_scales), jnp.asarray(bias), k_rows=k_rows,
        co_tile=co_tile, negative_slope=0.2, out_dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_pick_tiles_constraints():
    from pcss_unet_tpu.ops.pallas.conv3x3_int8 import pick_tiles

    assert pick_tiles(272, 480, 512, 512) is not None   # dec_1 @1080p
    assert pick_tiles(136, 240, 1024, 1024) is not None  # dec_0 @1080p
    assert pick_tiles(101, 480, 512, 512) is None        # odd H not tileable
    assert pick_tiles(272, 480, 96, 512) is None         # C not lane-aligned




def _xla_block(x, params, slope=0.2):
    import flax.linen as nn

    a = jax.lax.conv_general_dilated(
        x, jnp.asarray(params["conv_a"]["kernel"], x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a = nn.leaky_relu(a + jnp.asarray(params["conv_a"]["bias"], x.dtype),
                      negative_slope=slope)
    b = jax.lax.conv_general_dilated(
        a, jnp.asarray(params["conv_b"]["kernel"], x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return nn.leaky_relu(b + jnp.asarray(params["conv_b"]["bias"], x.dtype),
                         negative_slope=slope)


def _block_params(rng, c, co):
    return {
        "conv_a": {"kernel": rng.standard_normal(
            (3, 3, c, c)).astype(np.float32) * 0.05,
            "bias": rng.standard_normal(c).astype(np.float32) * 0.1},
        "conv_b": {"kernel": rng.standard_normal(
            (1, 1, c, co)).astype(np.float32) * 0.05,
            "bias": rng.standard_normal(co).astype(np.float32) * 0.1},
    }


def test_whole_block_int8_kernel(rng):
    """ops/pallas/block_int8.py ≈ the float block within int8 noise
    (interpreter mode; same kernel compiles on TPU).  Also pins the VMEM
    pickers for the deployment shapes."""
    from pcss_unet_tpu.ops.pallas.block_int8 import (
        fused_block_int8_nhwc, pack_block_int8_params, pick_k_rows_int8,
        pick_kchunked,
    )

    c, co, h, w = 128, 64, 8, 16
    params = _block_params(rng, c, co)
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    ref = np.asarray(_xla_block(x, params))
    k = pick_k_rows_int8(h, w, c, co)
    got = np.asarray(fused_block_int8_nhwc(
        x, *pack_block_int8_params(params), k_rows=k, interpret=True))
    rel = np.abs(got - ref) / (np.abs(ref) + 0.5)
    assert rel.mean() < 0.02, rel.mean()
    # deployment shapes at 1080p
    assert pick_k_rows_int8(272, 480, 512, 128) is not None   # dec_1
    assert pick_k_rows_int8(136, 240, 1024, 512) is None      # dec_0: 9.4MB w
    assert pick_kchunked(136, 240, 1024, 512) is not None     # → k-chunked


def test_kchunked_block_int8_kernel(rng):
    """Contraction-chunked variant ≡ the plain whole-block scheme up to
    per-chunk activation scales (tolerance vs the float block)."""
    from pcss_unet_tpu.ops.pallas.block_int8 import (
        fused_block_int8_kchunked, pack_block_int8_params, pick_kchunked,
    )

    c, co, h, w = 256, 64, 4, 32
    params = _block_params(rng, c, co)
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    ref = np.asarray(_xla_block(x, params))
    k, _ = pick_kchunked(h, w, c, co)
    cc = 128  # force 2 chunks so multi-chunk accumulation is exercised
    got = np.asarray(fused_block_int8_kchunked(
        x, *pack_block_int8_params(params), k_rows=k, c_chunk=cc,
        interpret=True))
    rel = np.abs(got - ref) / (np.abs(ref) + 0.5)
    assert rel.mean() < 0.02, rel.mean()


def test_model_int8_path_close_to_plain(rng):
    """Whole-model: folded-BN UNet with int8_inference ≈ the float graph
    (sigmoid-mask output, so int8 noise stays small in absolute terms)."""
    from pcss_unet_tpu.infer import InferenceEngine
    from pcss_unet_tpu.models import UNet

    # widths chosen so the int8 gate (cin ≥ 256, wide-in/narrow-out)
    # actually fires: the decoder block after the 256-wide bottleneck
    # sees a 256-channel input with 64 output features
    model = UNet(encoder_widths=(64, 256), dtype=jnp.float32,
                 dropout_rate=0.0)
    key = jax.random.PRNGKey(2)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 32, 32, 4)), True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    frame = rng.standard_normal((48, 64, 4)).astype(np.float32)
    plain = InferenceEngine(model, variables, dtype=jnp.float32,
                            fold_bn=True, use_pallas=False)(frame)
    q = InferenceEngine(model, variables, dtype=jnp.float32,
                        fold_bn=True, use_pallas=False,
                        quantize="int8")(frame)
    mse = float(np.mean((plain - q) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 30.0, psnr
    # misuse guard: int8 without folding is an error
    import pytest

    with pytest.raises(ValueError):
        InferenceEngine(model, variables, dtype=jnp.float32,
                        quantize="int8")
