"""Loss-VALUE parity of the perceptual loss, auto-armed the day real
weights land (VERDICT r3 next-#7).

The zero-egress TPU image has neither torchvision nor a cached ImageNet
VGG-19 checkpoint, so the ImageNet half of this file skips today — but the
moment ``vgg19_imagenet.npz`` (scripts/convert_vgg_weights.py output) is
dropped at the repo root (or $PCSS_VGG_NPZ), it runs without a code change
and asserts end-to-end loss-value parity of ``losses/vgg.py`` against the
reference ``MultiLayerVGGLoss`` semantics (customLoss.py:7-90) on fixture
images, executed through a live torch tower loaded with the SAME weights.

The random-weights variant of the same assertion always runs: it pins the
full semantic chain (scrub → clamp → gray→3ch → normalize → taps → L1 →
weight blend) so only the weight artifact itself is environment-bound.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pcss_unet_tpu.losses.vgg import PerceptualLoss  # noqa: E402
from pcss_unet_tpu.parity.vgg_torch import (  # noqa: E402
    build_vgg19_features_torch, convert_features_module,
    load_features_npz_into_torch, reference_vgg_loss_torch,
)

IMAGENET_NPZ = os.environ.get(
    "PCSS_VGG_NPZ",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "vgg19_imagenet.npz"))


def _fixture_pair():
    rng = np.random.default_rng(7)
    # a plausible shadow-mask pair: smooth-ish fields in [0,1] plus a NaN
    # and an inf to exercise the scrub path (customLoss.py:48-52)
    out = rng.random((2, 64, 64, 1)).astype(np.float32)
    tgt = np.clip(out + 0.1 * rng.standard_normal(out.shape), 0, 1)
    out[0, 3, 3, 0] = np.nan
    out[1, 5, 5, 0] = np.inf
    return out, tgt.astype(np.float32)


def _assert_loss_parity(npz_path):
    seq = build_vgg19_features_torch().eval()
    load_features_npz_into_torch(seq, np.load(npz_path))
    out, tgt = _fixture_pair()
    ref = reference_vgg_loss_torch(seq, out, tgt)
    got = float(PerceptualLoss(npz_path)(out, tgt))
    assert ref == pytest.approx(got, rel=2e-4, abs=1e-6), (
        f"perceptual loss diverged from reference semantics: "
        f"torch={ref:.8f} jax={got:.8f}")


def test_loss_value_parity_random_weights(tmp_path):
    """Always runs: same assertion, seeded-random tower (semantics pin)."""
    torch.manual_seed(3)
    seq = build_vgg19_features_torch().eval()
    npz = str(tmp_path / "vgg_rand.npz")
    np.savez(npz, **convert_features_module(seq))
    _assert_loss_parity(npz)


@pytest.mark.skipif(not os.path.exists(IMAGENET_NPZ),
                    reason="vgg19_imagenet.npz artifact not present "
                           "(zero-egress image; see "
                           "scripts/convert_vgg_weights.py)")
def test_loss_value_parity_imagenet_weights():
    """Armed automatically once the ImageNet artifact exists."""
    _assert_loss_parity(IMAGENET_NPZ)


def _torchvision_available():
    try:
        import torchvision  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _torchvision_available(),
                    reason="torchvision not installed on this image")
def test_convert_then_loss_parity_from_torchvision(tmp_path):
    """Full chain from the actual torchvision pretrained weights: download/
    load IMAGENET1K_V1 → convert → npz → loss-value parity."""
    import torchvision

    vgg = torchvision.models.vgg19(
        weights=torchvision.models.VGG19_Weights.IMAGENET1K_V1)
    npz = str(tmp_path / "vgg19_imagenet.npz")
    np.savez(npz, **convert_features_module(vgg.features.eval()))
    _assert_loss_parity(npz)
