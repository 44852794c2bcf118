"""Composite training losses.

- ``standard_loss`` ≡ reference ``CustomLoss`` (customLoss.py:92-193):
  α·L1 + (1−α)·VGG, α=0.9, plus the three terms the reference computes and
  discards (high-freq / penumbra / Sobel), here config-gated with default
  weight 0 for parity.
- ``enhanced_loss`` ≡ reference ``EnhancedCustomLoss`` (pert_loss.py:92-167):
  standard blend + perturb_weight·perturbation, returning a components dict.
  NOTE: in the reference this path *crashes at construction* — it imports a
  nonexistent ``VGGLoss`` (pert_loss.py:111; SURVEY.md §7 defect list).  It
  is rebuilt here, working, from the documented semantics.

Both take pre-computed model outputs; sigmoid-range enforcement is an
assertion in the reference (customLoss.py:131) — here a debug-mode checkify
assert in the train step instead of a Python assert inside jit."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from pcss_unet_tpu.losses.extras import (
    high_freq_loss, penumbra_weighted_l1, sobel_gradient_loss,
)
from pcss_unet_tpu.losses.perturbation import perturbation_loss
from pcss_unet_tpu.losses.ssim import ssim_loss
from pcss_unet_tpu.losses.vgg import PerceptualLoss


@dataclass
class LossBundle:
    """Bound loss configuration: perceptual net + blend weights."""

    perceptual: PerceptualLoss
    alpha: float = 0.9                  # config.ini:32
    perturb_weight: float = 0.1         # config.ini:13
    perturbation_count: int = 3         # config.ini:12
    high_freq_weight: float = 0.0
    penumbra_weight: float = 0.0
    sobel_weight: float = 0.0
    ssim_weight: float = 0.0

    def base_terms(self, output: jax.Array, target: jax.Array) -> dict:
        output = output.astype(jnp.float32)
        target = target.astype(jnp.float32)
        terms = {
            "l1_loss": jnp.mean(jnp.abs(output - target)),
            "vgg_loss": self.perceptual(output, target),
        }
        if self.high_freq_weight:
            terms["high_freq_loss"] = high_freq_loss(output, target)
        if self.penumbra_weight:
            terms["penumbra_loss"] = penumbra_weighted_l1(output, target)
        if self.sobel_weight:
            terms["sobel_loss"] = sobel_gradient_loss(output, target)
        if self.ssim_weight:
            terms["ssim_loss"] = ssim_loss(output, target)
        return terms

    def _blend(self, terms: dict) -> jax.Array:
        total = (self.alpha * terms["l1_loss"]
                 + (1.0 - self.alpha) * terms["vgg_loss"])
        total = total + self.high_freq_weight * terms.get("high_freq_loss", 0.0)
        total = total + self.penumbra_weight * terms.get("penumbra_loss", 0.0)
        total = total + self.sobel_weight * terms.get("sobel_loss", 0.0)
        total = total + self.ssim_weight * terms.get("ssim_loss", 0.0)
        return total


def standard_loss(bundle: LossBundle, output: jax.Array,
                  target: jax.Array) -> tuple[jax.Array, dict]:
    """α·L1 + (1−α)·VGG (+ gated extras).  → (total, components)."""
    terms = bundle.base_terms(output, target)
    total = bundle._blend(terms)
    terms["total_loss"] = total
    return total, terms


def enhanced_loss(bundle: LossBundle, apply_fn: Callable,
                  rng: jax.Array, inputs: jax.Array, output: jax.Array,
                  target: jax.Array, training: bool = True) -> tuple[jax.Array, dict]:
    """standard blend + perturb_weight·perturbation (pert_loss.py:117-167).
    The perturbation term is skipped outside training or at weight 0,
    mirroring pert_loss.py:149."""
    terms = bundle.base_terms(output, target)
    total = bundle._blend(terms)
    if training and bundle.perturb_weight > 0:
        pert = perturbation_loss(apply_fn, rng, inputs, output,
                                 count=bundle.perturbation_count)
        total = total + bundle.perturb_weight * pert
        terms["perturbation_loss"] = pert
    else:
        terms["perturbation_loss"] = jnp.float32(0.0)
    terms["total_loss"] = total
    return total, terms
