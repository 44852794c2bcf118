"""The jitted train/eval steps — the framework's hot loop.

Everything the reference does per batch in Python (main.py:237-423: input
NaN screen, AMP forward, loss, backward, 4 separate per-parameter gradient
triage loops, dynamic clip, optimizer step) compiles here into ONE XLA
computation:

- input standardization fused on device ((x−μ)/(σ+1e-8), setdata.py:316 —
  host-side in the reference)
- bf16 forward via the model's compute dtype (AMP analogue of
  main.py:257-259; bf16 needs no GradScaler, so the reference's loss-scaling
  machinery at main.py:175, 361-397 has no TPU equivalent by design)
- NaN/Inf gradient repair as ``optax.zero_nans`` in the optimizer chain
  (replaces the in-place mean+noise/±10×max surgery at main.py:294-354)
- dynamic global-norm clip (schedule of main.py:356-358)
- non-finite-loss step skip: the whole update is selected away with
  ``jnp.where``, preserving params/opt state, and a skip counter increments
  (replaces the Python ``continue`` at main.py:240-246, 315-317)

Multi-chip: the step is written sharding-agnostic.  Jitted over a mesh with
the batch sharded on ('data','spatial'), XLA inserts the gradient psums and
makes BatchNorm's batch-mean a *global* mean (sync-BN) automatically — the
explicit-collective variant lives in parallel/dp.py for comparison.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict, freeze, unfreeze

from pcss_unet_tpu.losses import LossBundle, enhanced_loss, standard_loss
from pcss_unet_tpu.train.schedule import clip_norm_for_step
from pcss_unet_tpu.train.state import TrainState


def standardize(x: jax.Array, means: jax.Array, stds: jax.Array) -> jax.Array:
    """Per-channel standardization with train-set stats (setdata.py:316)."""
    return (x - means) / (stds + 1e-8)


def _select_tree(pred, new_tree, old_tree):
    return jax.tree.map(lambda n, o: jnp.where(pred, n, o), new_tree, old_tree)


def build_train_step(cfg, bundle: LossBundle, means, stds,
                     steps_per_epoch: int,
                     per_block_norms: bool = True,
                     teacher=None) -> Callable:
    """→ ``train_step(state, x, y, rng) -> (state, metrics)`` (pure, jittable).

    ``per_block_norms`` adds a ``grad_norm/<block>`` metric per top-level
    module — the jitted equivalent of the reference's per-module backward
    hooks that log NaN/Inf and large-norm gradients (main.py:180-222),
    without the hook storm on the host.

    ``teacher``: optional ``(model, variables)`` for distillation (the
    paper's 25 MB→2.5 MB deployment trimming, paper.md:143): the teacher
    runs an eval-mode forward on the same standardized batch and
    ``cfg.distill_weight · mean((out − teacher_out)²)`` joins the loss.
    The teacher's forward is param-independent, so it computes once per
    step outside the gradient.

    ``cfg.grad_accum_steps > 1`` splits the batch into that many equal
    microbatches inside the step (``lax.scan``), accumulates gradients in
    fp32, and applies ONE optimizer update on their mean — the TPU answer
    to the reference's OOM-retry loop (main.py:478-499): only the
    per-microbatch activations must fit HBM.  For batch-mean losses on
    equal microbatches the averaged gradient equals the whole-batch
    gradient exactly (modulo fp reassociation); with BatchNorm the batch
    statistics are per-microbatch and the running stats chain through the
    scan — the same semantics torch users get from classic ``loss/N +
    backward`` accumulation.

    ``cfg.ema_decay > 0`` maintains ``state.ema_params`` (ema ← d·ema +
    (1−d)·θ after every applied update; skipped steps leave it untouched)
    for deployment via ``cli.infer --ema``."""
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)
    use_perturb = cfg.loss_type == "perturb"
    accum = max(1, int(getattr(cfg, "grad_accum_steps", 1)))
    ema_decay = float(getattr(cfg, "ema_decay", 0.0))
    if teacher is not None:
        t_model, t_vars = teacher
        t_vars = jax.tree.map(jnp.asarray, dict(t_vars))
        distill_w = jnp.float32(cfg.distill_weight)

    def train_step(state: TrainState, x_raw, y, rng):
        x = standardize(x_raw.astype(jnp.float32), means, stds)
        y = y.astype(jnp.float32)
        base_rng = jax.random.fold_in(rng, state.step)

        def grads_one(batch_stats, x_mb, y_mb, rng_mb):
            """Gradients + loss terms for one (micro)batch."""
            drop_rng, pert_rng, pert_drop_rng = jax.random.split(rng_mb, 3)
            if teacher is not None:
                soft = jax.lax.stop_gradient(
                    t_model.apply(t_vars, x_mb, False).astype(jnp.float32))

            def loss_fn(params):
                out, mutated = state.apply_fn(
                    {"params": params, "batch_stats": batch_stats},
                    x_mb, True, rngs={"dropout": drop_rng},
                    mutable=["batch_stats"])
                if use_perturb:
                    def pert_apply(xp):
                        # train-mode forward (dropout active, batch-stat BN),
                        # BN updates discarded — pert_loss.py:78-81 semantics
                        o, _ = state.apply_fn(
                            {"params": params, "batch_stats": batch_stats},
                            xp, True, rngs={"dropout": pert_drop_rng},
                            mutable=["batch_stats"])
                        return o
                    total, terms = enhanced_loss(bundle, pert_apply, pert_rng,
                                                 x_mb, out, y_mb,
                                                 training=True)
                else:
                    total, terms = standard_loss(bundle, out, y_mb)
                if teacher is not None:
                    d = jnp.mean((out.astype(jnp.float32) - soft) ** 2)
                    total = total + distill_w * d
                    terms = dict(terms)
                    terms["distill_loss"] = d
                    terms["total_loss"] = total
                return total, (mutated["batch_stats"], terms)

            (total, (new_stats, terms)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return grads, new_stats, terms, total

        if accum == 1:
            grads, new_stats, terms, total = grads_one(
                state.batch_stats, x, y, base_rng)
        else:
            b = x.shape[0]
            if b % accum:
                raise ValueError(f"batch size {b} is not divisible by "
                                 f"grad_accum_steps={accum}")
            mb = b // accum
            xs = (x.reshape(accum, mb, *x.shape[1:]),
                  y.reshape(accum, mb, *y.shape[1:]),
                  jnp.arange(accum))

            def body(carry, xs_i):
                stats, gacc = carry
                x_mb, y_mb, idx = xs_i
                g, stats, terms_i, total_i = grads_one(
                    stats, x_mb, y_mb, jax.random.fold_in(base_rng, idx))
                gacc = jax.tree.map(
                    lambda a, gi: a + gi.astype(jnp.float32), gacc, g)
                # scan requires an invariant carry pytree TYPE; flax mixes
                # dict/FrozenDict between init and mutable-apply output
                return (unfreeze(stats), gacc), (dict(terms_i), total_i)

            gacc0 = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                                 state.params)
            (new_stats, gsum), (terms_seq, totals) = jax.lax.scan(
                body, (unfreeze(state.batch_stats), gacc0), xs)
            # mean over microbatches, cast back to the param dtypes so the
            # optimizer sees the same dtypes as the accum=1 path
            grads = jax.tree.map(lambda g, p: (g / accum).astype(p.dtype),
                                 gsum, state.params)
            terms = jax.tree.map(jnp.mean, terms_seq)
            total = jnp.mean(totals)

        # flax mixes dict/FrozenDict between init and mutable-apply output;
        # the select below needs identical container types
        if isinstance(state.batch_stats, FrozenDict):
            new_stats = freeze(unfreeze(new_stats))

        # dynamic global-norm clip (main.py:356-358, 405)
        gnorm = optax.global_norm(grads)
        max_norm = clip_norm_for_step(state.step, steps_per_epoch,
                                      cfg.num_epochs, cfg.grad_clip_norm,
                                      cfg.grad_clip_decay)
        scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale.astype(g.dtype), grads)

        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        if ema_decay > 0:
            d = jnp.float32(ema_decay)
            new_ema = jax.tree.map(
                lambda e, p: (e * d
                              + p.astype(jnp.float32) * (1 - d)).astype(
                                  e.dtype),
                state.ema_params, new_params)
        else:
            new_ema = state.ema_params  # None: empty pytree, select is a no-op

        # skip-update guard: non-finite loss or gradient norm → keep state
        ok = jnp.isfinite(total) & jnp.isfinite(gnorm)
        new_state = state.replace(
            step=state.step + 1,
            params=_select_tree(ok, new_params, state.params),
            batch_stats=_select_tree(ok, new_stats, state.batch_stats),
            opt_state=_select_tree(ok, new_opt_state, state.opt_state),
            skipped_steps=state.skipped_steps + (1 - ok.astype(jnp.int32)),
            ema_params=_select_tree(ok, new_ema, state.ema_params),
        )
        metrics = {k: v for k, v in terms.items()}
        metrics["grad_norm"] = gnorm
        metrics["clip_max_norm"] = max_norm
        metrics["skipped"] = 1 - ok.astype(jnp.int32)
        if per_block_norms:
            for block_name, block_grads in dict(grads).items():
                metrics[f"grad_norm/{block_name}"] = optax.global_norm(
                    block_grads)
        return new_state, metrics

    return train_step


def build_eval_step(cfg, bundle: LossBundle, means, stds) -> Callable:
    """Full-frame (non-tiled) validation step (main.py:583-664): eval-mode
    forward + loss components.  Returns (metrics, output) so the loop can
    log prediction imagery like the reference's TB image grids."""
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)

    def eval_step(state: TrainState, x_raw, y):
        x = standardize(x_raw.astype(jnp.float32), means, stds)
        y = y.astype(jnp.float32)
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, False)
        total, terms = standard_loss(bundle, out, y)
        # perturbation is a train-only term (pert_loss.py:149); reference
        # validation reports it as 0
        terms["perturbation_loss"] = jnp.float32(0.0)
        return terms, out

    return eval_step
