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
from flax.core import FrozenDict, freeze, unfreeze
from jax.sharding import Mesh, PartitionSpec as P

from pcss_unet_tpu.losses import LossBundle, standard_loss
from pcss_unet_tpu.train.schedule import clip_norm_for_step
from pcss_unet_tpu.train.state import TrainState
from pcss_unet_tpu.train.step import _select_tree, standardize


def _require_sync_bn(model, fn_name: str) -> None:
    """Every explicit-DP builder needs sync-BN: without it each device
    computes batch_stats from its local shard only, and the replicated
    out_spec would silently keep one device's (wrong) statistics."""
    if (getattr(model, "normalization", "batch_norm") == "batch_norm"
            and getattr(model, "bn_axis_name", None) != "data"):
        raise ValueError(
            f"{fn_name} requires the model constructed with "
            "bn_axis_name='data' (sync-BN); got "
            f"bn_axis_name={getattr(model, 'bn_axis_name', None)!r}")


def _require_explicit_supported(cfg, fn_name: str) -> None:
    """The explicit builders pin the standard-loss whole-batch semantics;
    features the auto-SPMD step (train/step.py) composes — perturbation
    loss, gradient accumulation — are NOT implemented here.  Fail loudly
    instead of silently training something else."""
    if getattr(cfg, "loss_type", "standard") != "standard":
        raise ValueError(f"{fn_name} implements the standard loss only; "
                         f"got loss_type={cfg.loss_type!r} — use the "
                         "auto-SPMD build_train_step")
    if int(getattr(cfg, "grad_accum_steps", 1)) > 1:
        raise ValueError(f"{fn_name} does not implement gradient "
                         "accumulation; use the auto-SPMD build_train_step")


def _dp_grads(model, bundle, means, stds, state, x_raw, y, rng):
    """Shared explicit-DP forward/backward core (both builders): per-shard
    standardize → loss → grads, then the pmean trio over 'data'.
    → (grads, new_stats, terms, total)."""
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
        # non-BN models mutate nothing → keep the (empty) stats tree
        return total, (mutated.get("batch_stats", state.batch_stats), terms)

    (total, (new_stats, terms)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    if isinstance(state.batch_stats, FrozenDict):
        # flax mixes dict/FrozenDict between init and mutable-apply output;
        # the skip-guard select needs identical container types
        new_stats = freeze(unfreeze(new_stats))

    # explicit DP collectives: grad/loss/metric all-reduce over ICI
    grads = jax.lax.pmean(grads, "data")
    total = jax.lax.pmean(total, "data")
    terms = jax.lax.pmean(terms, "data")
    # batch_stats were already pmean'd inside BN via axis_name
    return grads, new_stats, terms, total


def _clip_scale(cfg, steps_per_epoch, step, grads):
    """Dynamic global-norm clip factor (main.py:356-358 schedule)."""
    gnorm = optax.global_norm(grads)
    max_norm = clip_norm_for_step(step, steps_per_epoch,
                                  cfg.num_epochs, cfg.grad_clip_norm,
                                  cfg.grad_clip_decay)
    return gnorm, jnp.minimum(1.0, max_norm / (gnorm + 1e-6))


def _metrics(terms, gnorm, ok):
    metrics = dict(terms)
    metrics["grad_norm"] = gnorm
    metrics["skipped"] = 1 - ok.astype(jnp.int32)
    return metrics


def build_explicit_dp_train_step(cfg, bundle: LossBundle, means, stds,
                                 steps_per_epoch: int, mesh: Mesh,
                                 model) -> Callable:
    """→ ``train_step(state, x, y, rng)`` where x, y are globally-shaped
    arrays sharded over mesh axis 'data'.  The model must be constructed
    with ``bn_axis_name='data'`` so BatchNorm cross-replica-means its batch
    statistics (sync-BN, matching the reference's whole-batch BN semantics
    on one device — SURVEY.md §7 hard-part 3).  Maintains
    ``state.ema_params`` when ``cfg.ema_decay > 0``, like the auto step."""
    _require_sync_bn(model, "build_explicit_dp_train_step")
    _require_explicit_supported(cfg, "build_explicit_dp_train_step")
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)
    ema_decay = float(getattr(cfg, "ema_decay", 0.0))

    def per_device_step(state: TrainState, x_raw, y, rng):
        # runs per shard under shard_map; axis 'data' is a named axis here
        grads, new_stats, terms, total = _dp_grads(
            model, bundle, means, stds, state, x_raw, y, rng)
        gnorm, scale = _clip_scale(cfg, steps_per_epoch, state.step, grads)
        grads = jax.tree.map(lambda g: g * scale.astype(g.dtype), grads)
        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        if ema_decay > 0:
            d = jnp.float32(ema_decay)
            new_ema = jax.tree.map(
                lambda e, p: (e * d + p.astype(jnp.float32)
                              * (1 - d)).astype(e.dtype),
                state.ema_params, new_params)
        else:
            new_ema = state.ema_params
        ok = jnp.isfinite(total) & jnp.isfinite(gnorm)
        new_state = state.replace(
            step=state.step + 1,
            params=_select_tree(ok, new_params, state.params),
            batch_stats=_select_tree(ok, new_stats, state.batch_stats),
            opt_state=_select_tree(ok, new_opt_state, state.opt_state),
            skipped_steps=state.skipped_steps + (1 - ok.astype(jnp.int32)),
            ema_params=_select_tree(ok, new_ema, state.ema_params),
        )
        return new_state, _metrics(terms, gnorm, ok)

    state_spec = P()   # replicated
    data_spec = P("data")

    sharded = jax.shard_map(
        per_device_step, mesh=mesh,
        in_specs=(state_spec, data_spec, data_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# ZeRO-1: optimizer-state sharding over the 'data' axis
# ---------------------------------------------------------------------------
#
# Every optimizer this framework builds (train/state.py:make_optimizer) is
# elementwise — adam moments, decoupled/in-grad weight decay, zero_nans,
# lr scaling — so the update commutes with any partition of the flattened
# parameter vector.  Each device therefore keeps only 1/N of the optimizer
# moments (the 2×params fp32 that dominates optimizer HBM for adam),
# updates its chunk, and an all-gather over ICI reassembles the params.
# Gradients are still pmean'd in full (ZeRO-1, not ZeRO-2): at this model
# scale the moment memory is the win and the extra reduce-scatter plumbing
# buys nothing.

from flax import struct  # noqa: E402


class Zero1State(struct.PyTreeNode):
    """Like TrainState but ``opt_state`` holds only this mesh-slice's chunk
    of the flattened-parameter optimizer state (globally: arrays sharded on
    axis 0 over 'data'; scalar counters replicated)."""

    step: jax.Array
    params: object
    batch_stats: object
    opt_state: object
    skipped_steps: jax.Array
    tx: object = struct.field(pytree_node=False)
    n_flat: int = struct.field(pytree_node=False)   # unpadded param count


def _flat_chunk(vec: jax.Array, chunk: int) -> jax.Array:
    idx = jax.lax.axis_index("data")
    return jax.lax.dynamic_slice(vec, (idx * chunk,), (chunk,))


def zero1_spec_tree(tree):
    """out/in_specs for a ZeRO-1 optimizer-state tree: chunk arrays sharded
    on 'data', scalar counters (e.g. adam's step count) replicated."""
    return jax.tree.map(lambda x: P("data") if getattr(x, "ndim", 0) else P(),
                        tree)


def create_zero1_state(model, cfg, steps_per_epoch: int, sample_shape,
                       mesh: Mesh, seed: int | None = None) -> Zero1State:
    """Initialize params (replicated) + the sharded optimizer state.
    The model must use sync-BN (``bn_axis_name='data'``) — see
    build_zero1_dp_train_step."""
    _require_sync_bn(model, "create_zero1_state")
    from jax.flatten_util import ravel_pytree

    from pcss_unet_tpu.train.state import make_optimizer

    key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
    dummy = jnp.zeros(sample_shape, jnp.float32)
    variables = model.init({"params": key, "dropout": key}, dummy, True)
    params = variables["params"]
    tx = make_optimizer(cfg, steps_per_epoch)

    flat, _ = ravel_pytree(params)
    n = mesh.shape["data"]
    chunk = -(-flat.shape[0] // n)  # ceil
    padded = jnp.pad(flat, (0, chunk * n - flat.shape[0]))

    def init_shard(vec):
        return tx.init(_flat_chunk(vec, chunk))

    opt_state = jax.jit(jax.shard_map(
        init_shard, mesh=mesh, in_specs=(P(),),
        out_specs=zero1_spec_tree(jax.eval_shape(tx.init,
                                                 jnp.zeros(chunk))),
        check_vma=False))(padded)
    from flax.core import FrozenDict

    return Zero1State(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=opt_state, skipped_steps=jnp.zeros((), jnp.int32),
        tx=tx, n_flat=int(flat.shape[0]))


def build_zero1_dp_train_step(cfg, bundle: LossBundle, means, stds,
                              steps_per_epoch: int, mesh: Mesh,
                              model, state: Zero1State) -> Callable:
    """Explicit-collective DP step with ZeRO-1 sharded optimizer state:
    ``train_step(zero1_state, x, y, rng)`` with x, y sharded over 'data'.
    Numerically identical to the replicated explicit step (pinned in
    tests/test_dp_explicit.py) — the partition is purely an HBM layout.
    ``state`` (from create_zero1_state) supplies the optimizer-state pytree
    structure the shard specs are derived from.

    The model MUST be built with ``bn_axis_name='data'`` (sync-BN): the
    out_specs declare batch_stats replicated, which is only true when BN
    cross-replica-means its statistics — a plain model would silently
    produce divergent per-device batch_stats masked by the replicated
    spec."""
    _require_sync_bn(model, "build_zero1_dp_train_step")
    _require_explicit_supported(cfg, "build_zero1_dp_train_step")
    if float(getattr(cfg, "ema_decay", 0.0)) > 0:
        # Zero1State carries no EMA tree; silently training with a stale
        # (init-valued) EMA would deploy garbage via --ema
        raise ValueError("build_zero1_dp_train_step does not maintain EMA "
                         "parameters; use the auto-SPMD build_train_step "
                         "or set ema_decay=0")
    from jax.flatten_util import ravel_pytree

    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)
    n_dev = mesh.shape["data"]

    def per_device_step(state: Zero1State, x_raw, y, rng):
        grads, new_stats, terms, total = _dp_grads(
            model, bundle, means, stds, state, x_raw, y, rng)
        gnorm, scale = _clip_scale(cfg, steps_per_epoch, state.step, grads)

        flat_g, _ = ravel_pytree(grads)
        flat_p, unravel = ravel_pytree(state.params)
        chunk = -(-state.n_flat // n_dev)
        pad = chunk * n_dev - state.n_flat
        g_chunk = _flat_chunk(jnp.pad(flat_g * scale, (0, pad)), chunk)
        p_chunk = _flat_chunk(jnp.pad(flat_p, (0, pad)), chunk)

        updates, new_opt = state.tx.update(g_chunk, state.opt_state, p_chunk)
        # zero_nans' found_nan is computed from this device's chunk only;
        # the out_spec declares scalars replicated, so make it truly global
        # (any chunk saw a NaN) rather than device-dependent
        new_opt = jax.tree.map(
            lambda v: (jax.lax.pmax(v.astype(jnp.int32),
                                    "data").astype(v.dtype)
                       if getattr(v, "ndim", None) == 0
                       and v.dtype == jnp.bool_ else v),
            new_opt)
        new_p_chunk = optax.apply_updates(p_chunk, updates)
        new_flat = jax.lax.all_gather(new_p_chunk, "data",
                                      tiled=True)[:state.n_flat]
        new_params = unravel(new_flat)

        ok = jnp.isfinite(total) & jnp.isfinite(gnorm)
        new_state = state.replace(
            step=state.step + 1,
            params=_select_tree(ok, new_params, state.params),
            batch_stats=_select_tree(ok, new_stats, state.batch_stats),
            opt_state=_select_tree(ok, new_opt, state.opt_state),
            skipped_steps=state.skipped_steps + (1 - ok.astype(jnp.int32)),
        )
        return new_state, _metrics(terms, gnorm, ok)

    state_specs = Zero1State(
        step=P(), params=jax.tree.map(lambda _: P(), state.params),
        batch_stats=jax.tree.map(lambda _: P(), state.batch_stats),
        opt_state=zero1_spec_tree(state.opt_state), skipped_steps=P(),
        tx=state.tx, n_flat=state.n_flat)
    sharded = jax.shard_map(
        per_device_step, mesh=mesh,
        in_specs=(state_specs, P("data"), P("data"), P()),
        out_specs=(state_specs, P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))
