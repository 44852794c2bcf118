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
                   std_factor: float = 0.01) -> jax.Array:
    """→ [p, B, H, W, C] noisy copies with per-channel scaled noise."""
    # Bessel-corrected std over the full per-channel tensor (torch .std())
    ch_std = jnp.std(inputs.astype(jnp.float32), axis=(0, 1, 2), ddof=1)
    noise = jax.random.normal(rng, (count, *inputs.shape), jnp.float32)
    scaled = noise * ch_std * std_factor
    return inputs[None].astype(jnp.float32) + scaled


def perturbation_loss(apply_fn: Callable[[jax.Array], jax.Array],
                      rng: jax.Array, inputs: jax.Array,
                      original_output: jax.Array, count: int = 3,
                      std_factor: float = 0.01) -> jax.Array:
    """Mean L1 drift of the model under small input perturbations.

    ``apply_fn``: x → model output (train-mode semantics, no state updates).
    Gradients flow through ``original_output`` only (pert_loss.py:78-81)."""
    perturbed = perturb_inputs(rng, inputs, count, std_factor)
    outs = jax.vmap(apply_fn)(perturbed)          # [p, B, H, W, 1]
    outs = jax.lax.stop_gradient(outs)
    diffs = jnp.abs(original_output[None].astype(jnp.float32) - outs)
    return jnp.mean(diffs)
