"""Parity tests for primitive ops against torch (CPU) ground truth.

The reference relies on torch's exact semantics for pixel_(un)shuffle
(Unetmodel.py:67, 86), align-corners bilinear interpolation
(Unetmodel.py:51, 97, 119), and AvgPool2d(2) (Unetmodel.py:40) — these tests
pin our NHWC implementations to those semantics so torch-trained checkpoints
stay PSNR-faithful after conversion."""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from pcss_unet_tpu.ops import (
    avg_pool_2x,
    pixel_shuffle_nhwc,
    pixel_unshuffle_nhwc,
    resize_bilinear_align_corners,
    upsample2x_align_corners,
)


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


@pytest.mark.parametrize("shape", [(2, 8, 8, 4), (1, 6, 10, 3), (3, 16, 16, 1)])
def test_pixel_unshuffle_matches_torch(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(pixel_unshuffle_nhwc(jnp.asarray(x), 2))
    ref = F.pixel_unshuffle(torch.from_numpy(nchw(x)), 2).numpy()
    np.testing.assert_array_equal(ours, nhwc(ref))


@pytest.mark.parametrize("shape,r", [((2, 4, 4, 16), 2), ((1, 3, 5, 36), 3)])
def test_pixel_shuffle_matches_torch(rng, shape, r):
    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(pixel_shuffle_nhwc(jnp.asarray(x), r))
    ref = F.pixel_shuffle(torch.from_numpy(nchw(x)), r).numpy()
    np.testing.assert_array_equal(ours, nhwc(ref))


def test_shuffle_roundtrip(rng):
    x = rng.standard_normal((2, 12, 8, 4)).astype(np.float32)
    y = pixel_shuffle_nhwc(pixel_unshuffle_nhwc(jnp.asarray(x), 2), 2)
    np.testing.assert_array_equal(np.asarray(y), x)


@pytest.mark.parametrize("method", ["matmul", "gather"])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 8), (16, 16)),      # clean 2x (decoder upsample, Unetmodel.py:51)
     ((7, 9), (14, 18)),      # odd 2x
     ((16, 16), (13, 11)),    # downsize (odd-input fixup, Unetmodel.py:93-97)
     ((5, 5), (5, 5)),        # identity
     ((1, 4), (3, 8))],       # degenerate H=1
)
def test_resize_align_corners_matches_torch(rng, in_hw, out_hw, method):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw,
                                                    method))
    ref = F.interpolate(
        torch.from_numpy(nchw(x)), size=out_hw, mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(ours, nhwc(ref), rtol=1e-5, atol=1e-5)


def test_composed_resize_matches_sequential(rng):
    """Folded up-2×-then-down chain ≡ running the two resizes separately
    (the head fold of Unetmodel.py:140-141)."""
    from pcss_unet_tpu.ops.resize import (
        compose_resize_matrices, resize_with_matrices,
    )
    x = jnp.asarray(rng.standard_normal((1, 24, 40, 8)).astype(np.float32))
    seq = resize_bilinear_align_corners(
        resize_bilinear_align_corners(x, (48, 80)), (24, 40))
    m_h, m_w = compose_resize_matrices((24, 48, 24), (40, 80, 40))
    folded = resize_with_matrices(x, m_h, m_w)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(seq),
                               rtol=1e-5, atol=1e-6)


def test_banded_apply_matches_dense(rng):
    """banded_apply ≡ the dense einsum on banded AND non-banded matrices
    (large sizes so the banded path actually triggers; alignment variants
    for lane/sublane/free axes)."""
    from pcss_unet_tpu.ops.resize import banded_apply, interp_matrix

    x = jnp.asarray(rng.standard_normal((1, 3, 96, 256)).astype(np.float32))
    for m, axis, align in [
        (interp_matrix(96, 192), 2, 8),          # 2x upsample, sublane axis
        (interp_matrix(256, 512), 3, 128),       # lane axis, 128-aligned
        (interp_matrix(96, 40), 2, 1),           # downsize band
        (rng.standard_normal((64, 96)).astype(np.float32), 2, 8),  # dense →
        # fallback path (banding saves nothing on a full matrix)
    ]:
        got = np.asarray(banded_apply(x, m, axis=axis, align=align))
        eq = "oh,nchw->ncow" if axis == 2 else "ow,nchw->ncho"
        want = np.einsum(eq, m, np.asarray(x))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # zero-padded matrix (chw engine's lane-padded resize): pad rows/cols
    # stay exactly zero through the banded path
    mp = np.zeros((256, 256), np.float32)
    mp[:192, :200] = interp_matrix(200, 192)
    got = np.asarray(banded_apply(x, mp, axis=3, align=128))
    assert np.all(got[..., 192:] == 0.0)
    want = np.einsum("oi,ncai->ncao", mp, np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_upsample2x_matches_torch(rng):
    x = rng.standard_normal((1, 9, 13, 2)).astype(np.float32)
    ours = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    up = torch.nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
    ref = up(torch.from_numpy(nchw(x))).numpy()
    np.testing.assert_allclose(ours, nhwc(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [(8, 8), (9, 7)])
def test_avg_pool_matches_torch(rng, hw):
    x = rng.standard_normal((2, *hw, 5)).astype(np.float32)
    ours = np.asarray(avg_pool_2x(jnp.asarray(x)))
    ref = torch.nn.AvgPool2d(2)(torch.from_numpy(nchw(x))).numpy()
    np.testing.assert_allclose(ours, nhwc(ref), rtol=1e-6, atol=1e-6)


def test_pixel_shuffle_mxu_exact():
    """MXU one-hot-contraction twins of the pixel shuffles are
    bit-identical to the reshape forms (both dtypes, odd-ish sizes)."""
    import jax.numpy as jnp

    from pcss_unet_tpu.ops import (pixel_shuffle_nhwc,
                                   pixel_shuffle_nhwc_mxu,
                                   pixel_unshuffle_nhwc,
                                   pixel_unshuffle_nhwc_mxu)

    rng = np.random.default_rng(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((2, 12, 20, 4)), dtype)
        ref = np.asarray(pixel_unshuffle_nhwc(x, 2))
        got = np.asarray(pixel_unshuffle_nhwc_mxu(x, 2))
        np.testing.assert_array_equal(got, ref)
        y = jnp.asarray(rng.standard_normal((2, 6, 10, 16)), dtype)
        ref = np.asarray(pixel_shuffle_nhwc(y, 2))
        got = np.asarray(pixel_shuffle_nhwc_mxu(y, 2))
        np.testing.assert_array_equal(got, ref)
    # r != 2 falls back to the reshape form
    x = jnp.asarray(rng.standard_normal((1, 9, 9, 2)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(pixel_unshuffle_nhwc_mxu(x, 3)),
        np.asarray(pixel_unshuffle_nhwc(x, 3)))


def test_unet_mxu_shuffle_gate(monkeypatch):
    """UNet inference uses the MXU shuffles by default; the env override
    and the training path keep the reshape form — outputs identical."""
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.models import UNet

    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                 dropout_rate=0.0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16, 24, 4)).astype(np.float32))
    variables = model.init({"params": key, "dropout": key}, x, False)
    ref = np.asarray(model.apply(variables, x, False))
    monkeypatch.setenv("PCSS_PIXELSHUFFLE", "xla")
    got = np.asarray(model.apply(variables, x, False))
    np.testing.assert_array_equal(got, ref)
