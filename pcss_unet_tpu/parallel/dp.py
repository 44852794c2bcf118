"""Explicit-collective data-parallel train step (shard_map + psum).

The primary training path relies on jit's automatic SPMD partitioner
(train/step.py): shard the batch, XLA inserts gradient all-reduces and
global BN statistics.  This module is the *explicit* formulation of the
same computation — shard_map over the 'data' axis with hand-placed
``jax.lax.pmean`` on gradients/metrics and ``axis_name``-synced BatchNorm —
the scaling-book recipe spelled out.  It exists because:

- it pins the semantics the auto path must reproduce (the equivalence test
  in tests/test_dp_explicit.py is a regression net for partitioner changes),
- per-device control (e.g. skipping collectives for local-only metrics,
  future reduce-scatter optimizer sharding) needs the explicit form.

Reference equivalence: none — the reference is strictly single-GPU
(SURVEY.md §2.12); this is new capability.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from pcss_unet_tpu.losses import LossBundle, standard_loss
from pcss_unet_tpu.train.schedule import clip_norm_for_step
from pcss_unet_tpu.train.state import TrainState
from pcss_unet_tpu.train.step import _select_tree, standardize


def build_explicit_dp_train_step(cfg, bundle: LossBundle, means, stds,
                                 steps_per_epoch: int, mesh: Mesh,
                                 model) -> Callable:
    """→ ``train_step(state, x, y, rng)`` where x, y are globally-shaped
    arrays sharded over mesh axis 'data'.  The model must be constructed
    with ``bn_axis_name='data'`` so BatchNorm cross-replica-means its batch
    statistics (sync-BN, matching the reference's whole-batch BN semantics
    on one device — SURVEY.md §7 hard-part 3)."""
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)

    def per_device_step(state: TrainState, x_raw, y, rng):
        # runs per shard under shard_map; axis 'data' is a named axis here
        x = standardize(x_raw.astype(jnp.float32), means, stds)
        y = y.astype(jnp.float32)
        drop_rng = jax.random.fold_in(
            jax.random.fold_in(rng, state.step),
            jax.lax.axis_index("data"))

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, True, rngs={"dropout": drop_rng},
                mutable=["batch_stats"])
            total, terms = standard_loss(bundle, out, y)
            return total, (mutated["batch_stats"], terms)

        (total, (new_stats, terms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # explicit DP collectives: grad/loss/metric all-reduce over ICI
        grads = jax.lax.pmean(grads, "data")
        total = jax.lax.pmean(total, "data")
        terms = jax.lax.pmean(terms, "data")
        # batch_stats were already pmean'd inside BN via axis_name

        gnorm = optax.global_norm(grads)
        max_norm = clip_norm_for_step(state.step, steps_per_epoch,
                                      cfg.num_epochs, cfg.grad_clip_norm,
                                      cfg.grad_clip_decay)
        scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale.astype(g.dtype), grads)
        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        ok = jnp.isfinite(total) & jnp.isfinite(gnorm)
        new_state = state.replace(
            step=state.step + 1,
            params=_select_tree(ok, new_params, state.params),
            batch_stats=_select_tree(ok, new_stats, state.batch_stats),
            opt_state=_select_tree(ok, new_opt_state, state.opt_state),
            skipped_steps=state.skipped_steps + (1 - ok.astype(jnp.int32)),
        )
        metrics = dict(terms)
        metrics["grad_norm"] = gnorm
        metrics["skipped"] = 1 - ok.astype(jnp.int32)
        return new_state, metrics

    state_spec = P()   # replicated
    data_spec = P("data")

    sharded = jax.shard_map(
        per_device_step, mesh=mesh,
        in_specs=(state_spec, data_spec, data_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))
