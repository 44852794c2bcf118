"""Learning-rate and gradient-clip schedules.

Reference LR schedule (main.py:959-969): LambdaLR with linear warmup over
``warmup_epochs`` then cosine decay floored at 1% of the base LR, stepped
once per epoch after validation.  Here the same curve is a per-step optax
schedule: evaluated at epoch boundaries it produces exactly the reference's
factors, and between boundaries it interpolates smoothly (set
``granularity='epoch'`` for the stair-stepped reference behavior).

Reference clip schedule (main.py:356-358, 405): global-norm clip with
max_norm 1.0 for the first half of training, then ``max(0.1, 1 −
epoch/num_epochs)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cosine_schedule(base_lr: float, warmup_epochs: int,
                           num_epochs: int, steps_per_epoch: int,
                           floor_fraction: float = 0.01,
                           granularity: str = "step") -> optax.Schedule:
    """→ optax schedule step → lr."""
    warmup_steps = max(1, warmup_epochs * steps_per_epoch)
    total_steps = max(warmup_steps + 1, num_epochs * steps_per_epoch)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if granularity == "epoch":
            step = jnp.floor(step / steps_per_epoch) * steps_per_epoch
        warm = step / warmup_steps
        progress = jnp.clip((step - warmup_steps)
                            / max(1, total_steps - warmup_steps), 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        decayed = jnp.maximum(jnp.float32(floor_fraction), cos)
        return base_lr * jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def clip_norm_for_step(step, steps_per_epoch: int, num_epochs: int,
                       initial: float = 1.0, enabled: bool = True):
    """Dynamic max-norm: ``initial`` for the first half of training, then
    ``max(0.1, 1 − epoch_ratio)`` (main.py:356-358)."""
    if not enabled:
        return jnp.float32(initial)
    epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
    ratio = epoch / max(1, num_epochs)
    late = jnp.maximum(jnp.float32(0.1), 1.0 - ratio)
    return jnp.where(ratio < 0.5, jnp.float32(initial), late)
