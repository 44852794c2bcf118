"""Train state and optimizer construction.

Optimizers mirror the reference's selection (main.py:952-957): adam (wd
1e-4, as torch Adam's L2-in-gradient semantics → optax.add_decayed_weights
inside the gradient path), adamw (decoupled wd 1e-3), sgd (momentum 0.9,
wd 1e-4).  The reference's Python-side NaN/Inf gradient triage
(main.py:287-418, four per-parameter Python loops — its hot-loop
serialization, SURVEY.md §3.1) is replaced by a jitted optax chain:
``zero_nans → clip_by_global_norm(dynamic) → optimizer``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # running counters (reference logs skip counts, main.py:240-246, 315-317)
    skipped_steps: jax.Array
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # EMA of params (cfg.ema_decay > 0); None = disabled.  None is an empty
    # pytree, so EMA-off states keep the exact leaf set older checkpoints
    # were written with.
    ema_params: Any = None


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    from pcss_unet_tpu.train.schedule import warmup_cosine_schedule

    lr = warmup_cosine_schedule(cfg.learning_rate, cfg.warmup_epochs,
                                cfg.num_epochs, steps_per_epoch,
                                cfg.lr_floor_fraction)
    opt = cfg.optimizer_type.lower()
    if opt == "adam":
        # torch Adam weight_decay = L2 term added to the gradient
        core = optax.chain(optax.add_decayed_weights(cfg.weight_decay_adam),
                           optax.scale_by_adam(),
                           optax.scale_by_learning_rate(lr))
    elif opt == "adamw":
        core = optax.adamw(lr, weight_decay=cfg.weight_decay_adamw)
    elif opt == "sgd":
        core = optax.chain(optax.add_decayed_weights(cfg.weight_decay_adam),
                           optax.sgd(lr, momentum=cfg.sgd_momentum))
    else:
        raise ValueError(f"unknown optimizer_type: {cfg.optimizer_type}")
    # NaN→0 repair replaces main.py:294-354's in-place NaN/Inf surgery
    return optax.chain(optax.zero_nans(), core)


def create_train_state(model, cfg, steps_per_epoch: int,
                       sample_shape: tuple, seed: int | None = None) -> TrainState:
    seed = cfg.seed if seed is None else seed
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros(sample_shape, jnp.float32)
    variables = model.init({"params": key, "dropout": key}, dummy, True)
    tx = make_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(params),
        skipped_steps=jnp.zeros((), jnp.int32),
        apply_fn=model.apply,
        tx=tx,
        # a distinct copy, NOT an alias of params: the fit() loop donates the
        # state, and aliased leaves donate the same buffer twice
        ema_params=(jax.tree.map(jnp.copy, params)
                    if getattr(cfg, "ema_decay", 0.0) > 0 else None),
    )
