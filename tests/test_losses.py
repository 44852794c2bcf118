"""Loss layer tests: torch-parity for image-space terms, semantic checks for
the perceptual/perturbation/temporal terms (customLoss.py / pert_loss.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from pcss_unet_tpu.losses import (
    LossBundle, PerceptualLoss, enhanced_loss, high_freq_loss,
    measure_temporal_instability, penumbra_weighted_l1, perturbation_loss,
    sobel_gradient_loss, standard_loss,
)
from pcss_unet_tpu.losses.perturbation import perturb_inputs


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    out = rng.random((2, 32, 32, 1)).astype(np.float32)
    tgt = rng.random((2, 32, 32, 1)).astype(np.float32)
    return out, tgt


def torch_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def test_high_freq_matches_torch(imgs):
    out, tgt = imgs
    ours = float(high_freq_loss(jnp.asarray(out), jnp.asarray(tgt)))
    # torch ground truth per customLoss.py:106-127 semantics
    k = 5
    x = torch.arange(k) - k // 2
    xg = x.expand(k, -1).float()
    yg = xg.t()
    kern = torch.exp(-(xg ** 2 + yg ** 2) / 2.0)
    kern = (kern / kern.sum()).view(1, 1, k, k)
    o, t = torch_nchw(out), torch_nchw(tgt)
    ho = o - F.conv2d(o, kern, padding=2)
    ht = t - F.conv2d(t, kern, padding=2)
    ref = float(F.l1_loss(ho, ht))
    assert abs(ours - ref) < 1e-6


def test_penumbra_matches_torch(imgs):
    out, tgt = imgs
    ours = float(penumbra_weighted_l1(jnp.asarray(out), jnp.asarray(tgt)))
    o, t = torch_nchw(out), torch_nchw(tgt)
    mask = ((t > 0.1) & (t < 0.9)).float()
    ref = float(F.l1_loss(o * mask, t * mask, reduction="sum")
                / (mask.sum() + 1e-8))
    assert abs(ours - ref) < 1e-5


def test_sobel_matches_torch(imgs):
    out, tgt = imgs
    ours = float(sobel_gradient_loss(jnp.asarray(out), jnp.asarray(tgt)))
    sx = torch.tensor([[-1., 0, 1], [-2, 0, 2], [-1, 0, 1]]).view(1, 1, 3, 3)
    sy = torch.tensor([[-1., -2, -1], [0, 0, 0], [1, 2, 1]]).view(1, 1, 3, 3)

    def mag(img):
        gx = F.conv2d(img, sx, padding=1)
        gy = F.conv2d(img, sy, padding=1)
        return torch.sqrt(gx ** 2 + gy ** 2 + 1e-6)

    ref = float(F.l1_loss(mag(torch_nchw(out)), mag(torch_nchw(tgt))))
    assert abs(ours - ref) < 1e-5


@pytest.fixture(scope="module")
def bundle():
    # seeded-random VGG features (no pretrained artifact in CI)
    return LossBundle(perceptual=PerceptualLoss(None), alpha=0.9)


def test_standard_loss_blend(bundle, imgs):
    out, tgt = imgs
    total, terms = standard_loss(bundle, jnp.asarray(out), jnp.asarray(tgt))
    expect = 0.9 * terms["l1_loss"] + 0.1 * terms["vgg_loss"]
    assert abs(float(total) - float(expect)) < 1e-6
    assert float(terms["l1_loss"]) > 0 and float(terms["vgg_loss"]) >= 0


def test_vgg_gradient_dead_by_default(imgs):
    """Reference parity: VGG branch contributes no gradient
    (customLoss.py:69-71, 90)."""
    out, tgt = imgs
    dead = PerceptualLoss(None, grad=False)
    live = PerceptualLoss(None, grad=True)
    g_dead = jax.grad(lambda o: dead(o, jnp.asarray(tgt)))(jnp.asarray(out))
    g_live = jax.grad(lambda o: live(o, jnp.asarray(tgt)))(jnp.asarray(out))
    assert float(jnp.abs(g_dead).max()) == 0.0
    assert float(jnp.abs(g_live).max()) > 0.0


def test_perturb_inputs_stats(rng):
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 4)).astype(np.float32) *
                    np.array([1, 2, 3, 4], np.float32))
    p = perturb_inputs(jax.random.PRNGKey(0), x, count=3, std_factor=0.01)
    assert p.shape == (3, 4, 16, 16, 4)
    noise = np.asarray(p - x[None])
    # per-channel noise std ≈ channel_std * 0.01
    ch_std = np.std(np.asarray(x), axis=(0, 1, 2), ddof=1)
    got = noise.std(axis=(0, 1, 2, 3))
    np.testing.assert_allclose(got, ch_std * 0.01, rtol=0.15)


def test_perturbation_loss_grad_only_through_original(imgs):
    out, _ = imgs
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((2, 32, 32, 4)).astype(np.float32))

    def fake_model(z):
        return jnp.mean(z, axis=-1, keepdims=True) * 0.1 + 0.5

    def f(o):
        return perturbation_loss(fake_model, jax.random.PRNGKey(0), x, o, 3)

    val = f(jnp.asarray(out))
    assert float(val) >= 0
    g = jax.grad(f)(jnp.asarray(out))
    assert np.isfinite(np.asarray(g)).all()


def test_enhanced_loss_components(bundle, imgs):
    out, tgt = imgs
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((2, 32, 32, 4)).astype(np.float32))

    def fake_model(z):
        return jnp.mean(jax.nn.sigmoid(z), axis=-1, keepdims=True)

    total, terms = enhanced_loss(bundle, fake_model, jax.random.PRNGKey(0),
                                 x, jnp.asarray(out), jnp.asarray(tgt))
    assert set(terms) >= {"l1_loss", "vgg_loss", "perturbation_loss",
                          "total_loss"}
    expect = (0.9 * terms["l1_loss"] + 0.1 * terms["vgg_loss"]
              + 0.1 * terms["perturbation_loss"])
    assert abs(float(total) - float(expect)) < 1e-6
    # eval mode: no perturbation term (pert_loss.py:149)
    total_eval, terms_eval = enhanced_loss(
        bundle, fake_model, jax.random.PRNGKey(0), x, jnp.asarray(out),
        jnp.asarray(tgt), training=False)
    assert float(terms_eval["perturbation_loss"]) == 0.0


def test_temporal_instability():
    frames = jnp.stack([jnp.zeros((1, 8, 8, 1)), jnp.ones((1, 8, 8, 1)) * 0.1])
    v = float(measure_temporal_instability(frames, alpha=5.0))
    assert abs(v - (np.exp(0.5) - 1)) < 1e-5
    # identical frames → 0
    same = jnp.zeros((3, 1, 8, 8, 1))
    assert float(measure_temporal_instability(same)) == 0.0
    # single frame → 0 (pert_loss.py:182-183)
    assert float(measure_temporal_instability(frames[:1])) == 0.0


def test_temporal_instability_motion_compensation():
    """A pure translation with correct motion vectors → ~zero instability."""
    rng = np.random.default_rng(0)
    base = rng.random((1, 16, 16, 1)).astype(np.float32)
    shifted = np.roll(base, 2, axis=2)  # shift right by 2 px
    frames = jnp.stack([jnp.asarray(base), jnp.asarray(shifted)])
    mv = np.zeros((1, 1, 16, 16, 2), np.float32)
    mv[..., 1] = 2.0  # dx = +2
    with_mv = float(measure_temporal_instability(frames, jnp.asarray(mv)))
    without = float(measure_temporal_instability(frames))
    # interior pixels match exactly under compensation; wrap column dominates
    assert with_mv < without * 0.5
