"""SSIM tests: identity, monotonicity under noise, symmetry, loss-blend
wiring (the reference carried 1−SSIM commented out, customLoss.py:187-191)."""

import numpy as np
import jax.numpy as jnp

from pcss_unet_tpu.losses import LossBundle, PerceptualLoss, ssim, ssim_loss, standard_loss


def test_ssim_identity(rng):
    x = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    assert abs(float(ssim(x, x)) - 1.0) < 1e-4  # fp32 var/cov cancellation
    assert abs(float(ssim_loss(x, x))) < 1e-4


def test_ssim_decreases_with_noise(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 1)).astype(np.float32))
    small = x + 0.01 * jnp.asarray(rng.standard_normal((1, 64, 64, 1)),
                                   jnp.float32)
    big = x + 0.2 * jnp.asarray(rng.standard_normal((1, 64, 64, 1)),
                                jnp.float32)
    s_small = float(ssim(x, jnp.clip(small, 0, 1)))
    s_big = float(ssim(x, jnp.clip(big, 0, 1)))
    assert 1.0 > s_small > s_big


def test_ssim_symmetric(rng):
    a = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    assert float(ssim(a, b)) == float(ssim(b, a))


def test_ssim_constant_shift():
    """Known closed form: constant images a, b → SSIM = (2ab+c1)/(a²+b²+c1)."""
    a = jnp.full((1, 32, 32, 1), 0.4)
    b = jnp.full((1, 32, 32, 1), 0.6)
    c1 = 0.01 ** 2
    expect = (2 * 0.4 * 0.6 + c1) / (0.4 ** 2 + 0.6 ** 2 + c1)
    assert abs(float(ssim(a, b)) - expect) < 1e-4


def test_ssim_in_blend(rng):
    bundle = LossBundle(perceptual=PerceptualLoss(None, taps=(2,),
                                                  tap_weights=(1.0,)),
                        ssim_weight=0.2)
    out = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    tgt = jnp.asarray(rng.random((1, 32, 32, 1)).astype(np.float32))
    total, terms = standard_loss(bundle, out, tgt)
    assert "ssim_loss" in terms
    base = 0.9 * terms["l1_loss"] + 0.1 * terms["vgg_loss"]
    assert abs(float(total) - float(base + 0.2 * terms["ssim_loss"])) < 1e-6
