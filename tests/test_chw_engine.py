"""Channels-major end-to-end engine (infer/chw_engine.py) ≡ the NHWC model.

The engine re-plumbs the whole forward in the fused kernels' native padded
channels-major layout; these tests pin it, stage for stage, against the
plain XLA UNet on the SAME folded-BN param tree at float32 (kernels in
interpreter mode on CPU), at the tolerances the per-kernel tests use."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcss_unet_tpu.infer.chw_engine import chw_forward
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.models.fold_bn import fold_batchnorm


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _folded(widths, seed=1):
    model = UNet(encoder_widths=widths, dtype=jnp.float32, dropout_rate=0.0)
    key = jax.random.PRNGKey(seed)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 64, 64, 4)), True)
    folded = fold_batchnorm(dict(variables))
    plain = model.clone(normalization="none")
    return plain, {"params": folded["params"],
                   "batch_stats": folded["batch_stats"]}


@pytest.mark.parametrize("widths,h,w", [
    ((16, 32), 48, 64),                 # all-chw-fusable net
    ((16, 32, 128, 256), 64, 160),      # trimmed-w16 structure: chw + 128
                                        # + wide NHWC interlude stages
])
def test_chw_forward_matches_plain(rng, widths, h, w):
    plain, variables = _folded(widths)
    x = jnp.asarray(rng.standard_normal((1, h, w, 4)).astype(np.float32))
    ref = np.asarray(plain.apply(variables, x, False))
    got = np.asarray(chw_forward(variables, x, dtype=jnp.float32,
                                 interpret=True))
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_chw_forward_128_routing_equivalent(rng):
    """cin=128 blocks match whether they stay channels-major or take the
    NHWC-native 128-kernel interlude."""
    plain, variables = _folded((16, 32, 128), seed=3)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 4)).astype(np.float32))
    ref = np.asarray(plain.apply(variables, x, False))
    for use128 in (True, False):
        got = np.asarray(chw_forward(variables, x, dtype=jnp.float32,
                                     use128_chw=use128, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_chw_forward_batch_and_taps(rng):
    plain, variables = _folded((16, 32), seed=5)
    x = jnp.asarray(rng.standard_normal((3, 32, 48, 4)).astype(np.float32))
    ref = np.asarray(plain.apply(variables, x, False))
    for taps in ("stack", "acc_shift", "loop"):
        got = np.asarray(chw_forward(variables, x, dtype=jnp.float32,
                                     taps=taps, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"taps={taps}")


def test_chw_forward_alignment_guard(rng):
    _, variables = _folded((16, 32))
    x = jnp.zeros((1, 30, 64, 4), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        chw_forward(variables, x, dtype=jnp.float32, interpret=True)


def test_engine_chw_layout_matches_nhwc(rng):
    """InferenceEngine(layout='chw') ≡ the default engine end-to-end,
    including the scrub/standardize pre-pass and output clip."""
    from pcss_unet_tpu.infer import InferenceEngine

    model = UNet(encoder_widths=(16, 32), dtype=jnp.float32,
                 dropout_rate=0.0)
    key = jax.random.PRNGKey(7)
    variables = dict(model.init({"params": key, "dropout": key},
                                jnp.zeros((1, 64, 64, 4)), True))
    means = rng.standard_normal(4).astype(np.float32)
    stds = (np.abs(rng.standard_normal(4)) + 0.5).astype(np.float32)
    kw = dict(means=means, stds=stds, dtype=jnp.float32, fold_bn=True,
              pallas_interpret=True)
    ref_engine = InferenceEngine(model, variables, **kw)
    chw_engine = InferenceEngine(model, variables, layout="chw", **kw)
    x = rng.standard_normal((1, 30, 40, 4)).astype(np.float32)
    x[0, 3, 5, 2] = np.nan  # scrub must still apply
    ref = ref_engine(x)
    got = chw_engine(x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_engine_chw_layout_guards():
    from pcss_unet_tpu.infer import InferenceEngine

    model = UNet(encoder_widths=(16, 32), dtype=jnp.float32,
                 dropout_rate=0.0)
    key = jax.random.PRNGKey(7)
    variables = dict(model.init({"params": key, "dropout": key},
                                jnp.zeros((1, 64, 64, 4)), True))
    with pytest.raises(ValueError, match="fold_bn"):
        InferenceEngine(model, variables, layout="chw",
                        pallas_interpret=True)
    with pytest.raises(ValueError, match="Pallas"):
        InferenceEngine(model, variables, layout="chw", fold_bn=True,
                        use_pallas=False)
    with pytest.raises(ValueError, match="layout"):
        InferenceEngine(model, variables, layout="nchw")


# ---------------------------------------------------------------------------
# MXU-banded layout movers (round 5): one-hot contraction twins of the
# XLA reshape/transpose entry / pools / exit must be EXACT (each output
# element is a single product by 1.0 under f32 accumulation).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w", [
    (64, 128),     # Wp exactly one pad block
    (32, 240),     # W/2 not a multiple of 128 (1920-style partial block)
])
def test_entry_mxu_exact(rng, h, w):
    from pcss_unet_tpu.infer import chw_engine as ce

    x = jnp.asarray(rng.standard_normal((2, h, w, 4)).astype(np.float32))
    for dtype in (jnp.float32, jnp.bfloat16):
        ref = np.asarray(ce._entry_chw(x, dtype))
        got = np.asarray(ce._entry_chw_mxu(x, dtype))
        assert got.shape == ref.shape and got.dtype == ref.dtype
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("h,w", [(64, 128), (32, 240)])
def test_exit_mxu_exact(rng, h, w):
    from pcss_unet_tpu.infer import chw_engine as ce

    wp = ce._wp(w // 2)
    x = np.zeros((2, 4, h // 2, wp), np.float32)
    x[..., :w // 2] = rng.standard_normal((2, 4, h // 2, w // 2))
    x = jnp.asarray(x)
    ref = np.asarray(ce._exit_nhwc(x, w, 1))
    got = np.asarray(ce._exit_nhwc_mxu(x, w, 1))
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("c,h,w", [(16, 64, 128), (32, 32, 240)])
def test_pool_mxu_matches(rng, c, h, w):
    from pcss_unet_tpu.infer import chw_engine as ce

    wp = ce._wp(w)
    x = np.zeros((1, c, h, wp), np.float32)
    x[..., :w] = rng.standard_normal((1, c, h, w))
    x = jnp.asarray(x)
    ref = np.asarray(ce._pool2x_chw(x, w))
    got = np.asarray(ce._pool2x_chw_mxu(x, w))
    assert got.shape == ref.shape
    # f32: both orderings of the 4-tap mean are exact to float noise
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    # pad columns must stay exactly zero (kernel SAME-padding invariant)
    assert np.all(got[..., w // 2:] == 0.0)


def test_chw_forward_movers_equivalent(rng):
    """Whole forward: movers='mxu' ≡ movers='xla' on the trimmed-net
    structure (chw + 128 + wide-interlude stages)."""
    plain, variables = _folded((16, 32, 128, 256), seed=9)
    x = jnp.asarray(rng.standard_normal((1, 64, 160, 4)).astype(np.float32))
    ref = np.asarray(chw_forward(variables, x, dtype=jnp.float32,
                                 movers="xla", interpret=True))
    got = np.asarray(chw_forward(variables, x, dtype=jnp.float32,
                                 movers="mxu", interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError, match="movers"):
        chw_forward(variables, x, movers="nope", interpret=True)


def test_chw_forward_wide_paths_equivalent(rng):
    """Wide stages: channels-major shifted-einsum path ≡ the NHWC
    interlude, and both ≡ the plain model (pads filtered downstream)."""
    plain, variables = _folded((16, 32, 128, 256), seed=11)
    x = jnp.asarray(rng.standard_normal((1, 32, 112, 4)).astype(np.float32))
    ref = np.asarray(plain.apply(variables, x, False))
    for wide in ("einsum", "nhwc", "auto"):
        got = np.asarray(chw_forward(variables, x, dtype=jnp.float32,
                                     wide=wide, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"wide={wide}")
    with pytest.raises(ValueError, match="wide"):
        chw_forward(variables, x, wide="nope", interpret=True)


def test_chw_forward_per_stage_taps(rng):
    """taps accepts a per-stage dict ('*' = default); parity holds for a
    mixed assignment."""
    plain, variables = _folded((16, 32), seed=13)
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 4)).astype(np.float32))
    ref = np.asarray(plain.apply(variables, x, False))
    got = np.asarray(chw_forward(
        variables, x, dtype=jnp.float32, interpret=True,
        taps={"dec_final": "chunk128", "enc_0": "acc_shift", "*": "stack"}))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
