"""Input-perturbation temporal-stability loss (paper §perturbation training;
reference pert_loss.py:7-90).

Semantics reproduced from the reference:

- per-channel noise scale = std of that channel across the whole batch
  (torch ``.std()``, Bessel-corrected) × ``std_factor=0.01``
  (pert_loss.py:40-56)
- ``p`` perturbed copies are re-forwarded through the model with gradients
  stopped (reference wraps the forwards in ``no_grad``, pert_loss.py:78-81)
- loss = mean over copies of L1(original_output, perturbed_output)
  (pert_loss.py:83-90)

TPU-first: the reference's Python loop over p sequential forwards collapses
into one ``vmap`` over a stacked noise batch — one compiled forward instead
of p, with XLA free to share weight loads (SURVEY.md §7 hard-part 4).

Note the reference runs the perturbed forwards with the model in train mode,
so dropout stays active and BN uses batch statistics; ``apply_fn`` here must
implement the same (train/step.py passes a train-mode apply with discarded
BN-stat updates — the torch side *does* mutate running stats in these
no-grad forwards, which is a side effect we deliberately do not replicate;
documented deviation)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def perturb_inputs(rng: jax.Array, inputs: jax.Array, count: int,
                   std_factor: float = 0.01,
                   noise_mode: str = "channel_std") -> jax.Array:
    """→ [p, B, H, W, C] noisy copies.

    noise_mode:
    - 'channel_std' (default): per-channel σ scaled by ``std_factor``
      (pert_loss.py:40-56, Bessel-corrected like torch ``.std()``)
    - 'fixed_eps': uniform ε=``std_factor`` noise with a [−10, 10] clamp —
      the reference's *second, orphaned* EnhancedCustomLoss variant
      (customLoss.py:223-231)
    """
    noise = jax.random.normal(rng, (count, *inputs.shape), jnp.float32)
    if noise_mode == "channel_std":
        ch_std = jnp.std(inputs.astype(jnp.float32), axis=(0, 1, 2), ddof=1)
        return inputs[None].astype(jnp.float32) + noise * ch_std * std_factor
    if noise_mode == "fixed_eps":
        perturbed = inputs[None].astype(jnp.float32) + noise * std_factor
        return jnp.clip(perturbed, -10.0, 10.0)  # customLoss.py:231
    raise ValueError(f"unknown noise_mode: {noise_mode}")


def perturbation_loss(apply_fn: Callable[[jax.Array], jax.Array],
                      rng: jax.Array, inputs: jax.Array,
                      original_output: jax.Array, count: int = 3,
                      std_factor: float = 0.01,
                      noise_mode: str = "channel_std",
                      metric: str = "l1") -> jax.Array:
    """Mean drift of the model under small input perturbations.

    ``apply_fn``: x → model output (train-mode semantics, no state updates).
    Gradients flow through ``original_output`` only (pert_loss.py:78-81).
    ``metric``: 'l1' (pert_loss.py:83-90) or 'mse' (the orphaned variant,
    customLoss.py:238)."""
    perturbed = perturb_inputs(rng, inputs, count, std_factor, noise_mode)
    outs = jax.vmap(apply_fn)(perturbed)          # [p, B, H, W, 1]
    outs = jax.lax.stop_gradient(outs)
    diffs = original_output[None].astype(jnp.float32) - outs
    if metric == "l1":
        return jnp.mean(jnp.abs(diffs))
    if metric == "mse":
        return jnp.mean(diffs ** 2)
    raise ValueError(f"unknown metric: {metric}")
