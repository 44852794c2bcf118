"""Fused ConvBlock Pallas kernel ≡ the XLA composition (interpreter mode —
the same kernel compiles on TPU; ops/pallas/convblock.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from pcss_unet_tpu.ops.pallas.convblock import (
    fused_conv_block_nhwc, pack_convblock_params,
)


def _xla_block(x, params, slope=0.2):
    a = jax.lax.conv_general_dilated(
        x, jnp.asarray(params["conv_a"]["kernel"], x.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a = nn.leaky_relu(a + jnp.asarray(params["conv_a"]["bias"], x.dtype),
                      negative_slope=slope)
    b = jax.lax.conv_general_dilated(
        a, jnp.asarray(params["conv_b"]["kernel"], x.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return nn.leaky_relu(b + jnp.asarray(params["conv_b"]["bias"], x.dtype),
                         negative_slope=slope)


def _make_params(rng, cin, cmid, cout):
    return {
        "conv_a": {
            "kernel": rng.standard_normal((3, 3, cin, cmid)).astype(np.float32) * 0.2,
            "bias": rng.standard_normal(cmid).astype(np.float32) * 0.1,
        },
        "conv_b": {
            "kernel": rng.standard_normal((1, 1, cmid, cout)).astype(np.float32) * 0.2,
            "bias": rng.standard_normal(cout).astype(np.float32) * 0.1,
        },
    }


@pytest.mark.parametrize("cin,cmid,cout,h,w,k", [
    (16, 16, 64, 32, 48, 8),      # enc_0 shape class
    (64, 64, 16, 24, 130, 8),     # dec_final class; W just over one lane tile
    (16, 16, 32, 30, 96, 6),      # H not divisible by k → row padding path
])
def test_fused_convblock_matches_xla(rng, cin, cmid, cout, h, w, k):
    params = _make_params(rng, cin, cmid, cout)
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32))
    ref = np.asarray(_xla_block(x, params))
    w1, b1, w2, b2 = pack_convblock_params(params, dtype=jnp.float32)
    got = np.asarray(fused_conv_block_nhwc(x, w1, b1, w2, b2, k_rows=k,
                                           interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_model_fused_inference_path_matches_plain(rng):
    """Whole-model check: folded-BN UNet with the fused-ConvBlock deployment
    path (interpreted on CPU) ≡ the plain XLA graph, same param tree."""
    from pcss_unet_tpu.infer import InferenceEngine
    from pcss_unet_tpu.models import UNet

    model = UNet(encoder_widths=(16, 32), dtype=jnp.float32, dropout_rate=0.0)
    key = jax.random.PRNGKey(1)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 32, 32, 4)), True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    frame = rng.standard_normal((48, 64, 4)).astype(np.float32)
    plain = InferenceEngine(model, variables, dtype=jnp.float32,
                            fold_bn=True, use_pallas=False)(frame)
    fused = InferenceEngine(model, variables, dtype=jnp.float32,
                            fold_bn=True, use_pallas=False,
                            pallas_interpret=True)(frame)
    np.testing.assert_allclose(fused, plain, rtol=1e-4, atol=1e-4)
    # and the sharded entry point still uses the partitioner-friendly graph
    engine = InferenceEngine(model, variables, dtype=jnp.float32,
                             fold_bn=True, use_pallas=False,
                             pallas_interpret=True)
    out_plain = engine.run_padded(
        jnp.asarray(frame[None]), plain=True)
    np.testing.assert_allclose(np.asarray(out_plain)[0], plain,
                               rtol=1e-5, atol=1e-6)


def test_fused_block128_matches_xla(rng):
    """NHWC-native whole-block kernel for 128-channel stages
    (ops/pallas/convblock128.py) ≡ the XLA composition."""
    from pcss_unet_tpu.ops.pallas.convblock128 import (
        fused_block128_nhwc, pack_block128_params, pick_k_rows_128,
    )

    cin, cout, h, w = 128, 64, 16, 24
    params = _make_params(rng, cin, cin, cout)
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32))
    ref = np.asarray(_xla_block(x, params))
    w1, b1, w2, b2 = pack_block128_params(params, dtype=jnp.float32)
    k = pick_k_rows_128(h, w, cin, cout)
    assert k is not None
    got = np.asarray(fused_block128_nhwc(x, w1, b1, w2, b2, k_rows=k,
                                         interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_model_block128_path_matches_plain(rng):
    """Whole-model: the dec block after a 128-wide bottleneck takes the
    block128 kernel path (interpreted on CPU) ≡ the plain XLA graph."""
    from pcss_unet_tpu.infer import InferenceEngine
    from pcss_unet_tpu.models import UNet

    model = UNet(encoder_widths=(64, 128), dtype=jnp.float32,
                 dropout_rate=0.0)
    key = jax.random.PRNGKey(4)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 32, 32, 4)), True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    frame = rng.standard_normal((48, 64, 4)).astype(np.float32)
    plain = InferenceEngine(model, variables, dtype=jnp.float32,
                            fold_bn=True, use_pallas=False)(frame)
    fused = InferenceEngine(model, variables, dtype=jnp.float32,
                            fold_bn=True, use_pallas=False,
                            pallas_interpret=True)(frame)
    np.testing.assert_allclose(fused, plain, rtol=1e-4, atol=1e-4)


def test_fused_convblock_batched(rng):
    params = _make_params(rng, 16, 16, 32)
    x = jnp.asarray(rng.standard_normal((3, 16, 32, 16)).astype(np.float32))
    ref = np.asarray(_xla_block(x, params))
    w1, b1, w2, b2 = pack_convblock_params(params, dtype=jnp.float32)
    got = np.asarray(fused_conv_block_nhwc(x, w1, b1, w2, b2, k_rows=8,
                                           interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("strategy", ["plain", "stack_taps", "acc_shift"])
def test_epilogue_mask_and_residual(rng, strategy):
    """In-kernel pad-column re-zeroing (true_w) and the fused skip-add
    (residual) ≡ kernel → explicit mask → explicit add, on all three tap
    strategies (the chw engine relies on both epilogue fusions)."""
    import jax.numpy as jnp

    from pcss_unet_tpu.ops.pallas.convblock import fused_conv_block_chw

    cin, cmid, cout, h, w, k = 16, 16, 32, 16, 100, 8
    wp = 128
    params = _make_params(rng, cin, cmid, cout)
    x = np.zeros((1, cin, h, wp), np.float32)
    x[..., :w] = rng.standard_normal((1, cin, h, w)).astype(np.float32)
    res = np.zeros((1, cout, h, wp), np.float32)
    res[..., :w] = rng.standard_normal((1, cout, h, w)).astype(np.float32)
    w1, b1, w2, b2 = pack_convblock_params(params, dtype=jnp.float32)
    kw = dict(k_rows=k, interpret=True,
              stack_taps=strategy == "stack_taps",
              acc_shift=strategy == "acc_shift")
    base = np.asarray(fused_conv_block_chw(
        jnp.asarray(x), w1, b1, w2, b2, **kw))
    mask = np.zeros((1, 1, 1, wp), np.float32)
    mask[..., :w] = 1.0
    want = base * mask + res
    got = np.asarray(fused_conv_block_chw(
        jnp.asarray(x), w1, b1, w2, b2, true_w=w,
        residual=jnp.asarray(res), **kw))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # the masked outputs really have zero pad columns
    assert np.all(got[..., w:] == 0.0)
    assert np.all(np.asarray(fused_conv_block_chw(
        jnp.asarray(x), w1, b1, w2, b2, true_w=w, **kw))[..., w:] == 0.0)


def test_rowpack_matches_xla(rng):
    """The M-packed (r output rows per MXU pass) kernel ≡ the XLA block,
    including the epilogue fusions, at the w16 level-0 shape class."""
    import jax.numpy as jnp

    from pcss_unet_tpu.ops.pallas.convblock import fused_conv_block_chw

    for cin, cmid, cout, h, w, k in [
            (16, 16, 16, 32, 100, 16),   # r=8: 2 chunks per band
            (32, 32, 16, 16, 96, 8),     # r=4
            (16, 16, 64, 24, 48, 6),     # r=2; k not a multiple of 8
    ]:
        params = _make_params(rng, cin, cmid, cout)
        x = jnp.asarray(rng.standard_normal((1, h, w, cin))
                        .astype(np.float32))
        ref = np.asarray(_xla_block(x, params))
        w1, b1, w2, b2 = pack_convblock_params(params, dtype=jnp.float32)
        got = np.asarray(fused_conv_block_nhwc(
            x, w1, b1, w2, b2, k_rows=k, interpret=True, rowpack=True))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"cin={cin} cout={cout}")
    # epilogue fusions under rowpack (chw entry point)
    cin = cmid = cout = 16
    wp, w, h, k = 128, 100, 16, 8
    params = _make_params(rng, cin, cmid, cout)
    xc = np.zeros((1, cin, h, wp), np.float32)
    xc[..., :w] = rng.standard_normal((1, cin, h, w)).astype(np.float32)
    res = np.zeros((1, cout, h, wp), np.float32)
    res[..., :w] = rng.standard_normal((1, cout, h, w)).astype(np.float32)
    w1, b1, w2, b2 = pack_convblock_params(params, dtype=jnp.float32)
    base = np.asarray(fused_conv_block_chw(
        jnp.asarray(xc), w1, b1, w2, b2, k_rows=k, interpret=True,
        rowpack=True))
    mask = np.zeros((1, 1, 1, wp), np.float32)
    mask[..., :w] = 1.0
    got = np.asarray(fused_conv_block_chw(
        jnp.asarray(xc), w1, b1, w2, b2, k_rows=k, interpret=True,
        rowpack=True, true_w=w, residual=jnp.asarray(res)))
    np.testing.assert_allclose(got, (base + res) * mask,
                               rtol=2e-4, atol=2e-4)
    assert np.all(got[..., w:] == 0.0)


@pytest.mark.parametrize("strategy", ["plain", "stack_taps", "chunk128",
                                      "acc_shift"])
@pytest.mark.parametrize("cin,cmid,cout,h,w,k", [
    (16, 16, 64, 32, 48, 8),      # enc_0 shape class
    (64, 64, 16, 24, 130, 8),     # dec_final class; W just over a lane tile
    (32, 32, 16, 16, 96, 8),      # chunk128: 4 taps/chunk ×2 + 1 remainder
])
def test_tap_strategies_match_xla(rng, strategy, cin, cmid, cout, h, w, k):
    """All four tap strategies — per-tap dots, stacked-K contraction,
    K=128-chunked contraction, output-accumulator shifts — compute the
    same ConvBlock."""
    params = _make_params(rng, cin, cmid, cout)
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32))
    ref = np.asarray(_xla_block(x, params))
    w1, b1, w2, b2 = pack_convblock_params(params, dtype=jnp.float32)
    got = np.asarray(fused_conv_block_nhwc(
        x, w1, b1, w2, b2, k_rows=k, interpret=True,
        stack_taps=("chunk128" if strategy == "chunk128"
                    else strategy == "stack_taps"),
        acc_shift=strategy == "acc_shift"))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
