"""VGG weight-conversion pipeline validation (VERDICT r1 missing #1).

torchvision is absent on this image but torch is present, so the torch
tower is built in raw torch with torchvision's exact vgg19.features layer
order (parity/vgg_torch.py).  The test drives the FULL conversion path —
torch module → OIHW→HWIO arrays → .npz on disk → ``load_vgg_params`` →
Flax ``VGG19Features`` forward — and asserts tap-activation parity against
the live torch forward at every reference tap (customLoss.py:8).
"""

import logging

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pcss_unet_tpu.models.vgg import (  # noqa: E402
    DEFAULT_TAPS, VGG19_CONVS, VGG19Features, load_vgg_params,
    vgg_weights_provenance,
)
from pcss_unet_tpu.parity.vgg_torch import (  # noqa: E402
    N_FEATURE_LAYERS, build_vgg19_features_torch, convert_features_module,
    torch_tap_activations,
)


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return np.inf
    peak = max(float(np.abs(a).max()), 1e-8)
    return 10.0 * np.log10(peak ** 2 / mse)


def test_torch_tower_matches_torchvision_structure():
    seq = build_vgg19_features_torch()
    assert len(seq) == N_FEATURE_LAYERS
    convs = dict(VGG19_CONVS)
    for idx, layer in enumerate(seq):
        if idx in convs:
            assert isinstance(layer, torch.nn.Conv2d)
            assert layer.out_channels == convs[idx]
            assert layer.kernel_size == (3, 3) and layer.padding == (1, 1)
        else:
            assert not isinstance(layer, torch.nn.Conv2d)


def test_converted_weights_tap_parity(tmp_path):
    torch.manual_seed(0)
    seq = build_vgg19_features_torch().eval()

    npz_path = str(tmp_path / "vgg_random.npz")
    np.savez(npz_path, **convert_features_module(seq))

    rng = np.random.default_rng(1)
    x_nhwc = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    ref = torch_tap_activations(seq, x_nhwc.transpose(0, 3, 1, 2),
                                DEFAULT_TAPS)

    params = load_vgg_params(npz_path)
    model = VGG19Features(taps=DEFAULT_TAPS)
    got = model.apply({"params": params}, x_nhwc)

    assert len(got) == len(ref) == 5
    for tap, r, g in zip(DEFAULT_TAPS, ref, got):
        g = np.asarray(g)
        assert g.shape == r.shape, f"tap {tap} shape {g.shape} vs {r.shape}"
        p = _psnr(r, g)
        assert p > 50.0, f"tap {tap} parity PSNR {p:.1f} dB"


def test_missing_artifact_fallback_is_loud(tmp_path, caplog):
    with caplog.at_level(logging.WARNING):
        load_vgg_params(str(tmp_path / "nope.npz"), taps=(2,))
    assert any("NOT FOUND" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        load_vgg_params(None, taps=(2,))
    assert any("seeded-random" in r.message for r in caplog.records)


def test_provenance_field(tmp_path):
    assert vgg_weights_provenance("") == "random-seeded-fallback"
    assert vgg_weights_provenance(None) == "random-seeded-fallback"
    p = tmp_path / "w.npz"
    np.savez(str(p), dummy=np.zeros(1))
    assert vgg_weights_provenance(str(p)) == f"pretrained:{p}"
