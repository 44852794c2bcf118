"""Gradient accumulation (cfg.grad_accum_steps) in the jitted train step.

The TPU answer to the reference's OOM-retry loop (main.py:478-499): a
batch that does not fit HBM is split into microbatches inside the step
(lax.scan), gradients accumulate in fp32, ONE optimizer update applies.
For batch-mean losses on equal microbatches the averaged gradient equals
the whole-batch gradient exactly, which is what the equivalence test pins.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.losses import LossBundle, PerceptualLoss
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.train import build_train_step, create_train_state

HW = 16


def _bundle(cfg):
    return LossBundle(
        perceptual=PerceptualLoss(None, taps=(2, 7), tap_weights=(0.5, 0.5)),
        alpha=cfg.alpha, perturb_weight=cfg.perturb_weight,
        perturbation_count=cfg.perturbation_count)


def _batch(batch=4):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((batch, HW, HW, 4)).astype(np.float32)
    y = rng.random((batch, HW, HW, 1)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def _state_and_step(cfg, model):
    state = create_train_state(model, cfg, steps_per_epoch=4,
                               sample_shape=(2, HW, HW, 4))
    step = jax.jit(build_train_step(cfg, _bundle(cfg),
                                    np.zeros(4, np.float32),
                                    np.ones(4, np.float32),
                                    steps_per_epoch=4))
    return state, step


def test_accum_matches_whole_batch():
    """accum=2 must reproduce the accum=1 update exactly when the loss is a
    plain batch mean and nothing couples samples (no BN, no dropout)."""
    base = Config(num_epochs=4, warmup_epochs=1, dropout_rate=0.0,
                  normalization="none", loss_type="standard")
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                 normalization="none", dropout_rate=0.0)
    x, y = _batch(4)
    rng = jax.random.PRNGKey(3)

    outs = {}
    for accum in (1, 2, 4):
        state, step = _state_and_step(base.replace(grad_accum_steps=accum),
                                      model)
        new_state, metrics = step(state, x, y, rng)
        outs[accum] = (jax.device_get(new_state.params),
                       float(metrics["total_loss"]),
                       float(metrics["grad_norm"]))

    p1, loss1, gn1 = outs[1]
    for accum in (2, 4):
        p, loss, gn = outs[accum]
        assert loss == pytest.approx(loss1, rel=1e-5)
        assert gn == pytest.approx(gn1, rel=1e-4)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5,
                                                    atol=2e-7), p, p1)


def test_accum_batchnorm_and_perturb_smoke():
    """BN + perturbation loss path under accumulation: runs, finite, BN
    running stats move, step/skip counters behave."""
    cfg = Config(num_epochs=4, warmup_epochs=1, loss_type="perturb",
                 perturbation_count=2, grad_accum_steps=2)
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32)
    state, step = _state_and_step(cfg, model)
    before = jax.device_get(state.batch_stats)
    x, y = _batch(4)
    new_state, metrics = step(state, x, y, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.isfinite(float(metrics["perturbation_loss"]))
    assert int(new_state.step) == 1
    assert int(new_state.skipped_steps) == 0
    after = jax.device_get(new_state.batch_stats)
    moved = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(a - b).max()), before, after))
    assert max(moved) > 0.0


def test_accum_rejects_indivisible_batch():
    cfg = Config(num_epochs=4, warmup_epochs=1, grad_accum_steps=3)
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32)
    state, step = _state_and_step(cfg, model)
    x, y = _batch(4)
    with pytest.raises(ValueError, match="grad_accum_steps"):
        step(state, x, y, jax.random.PRNGKey(0))


def test_find_accum_steps_governor():
    """The governor's auto mode: smallest divisor whose microbatch fits."""
    from pcss_unet_tpu.utils.memory import (
        estimate_memory_usage, find_accum_steps,
    )

    n = 15_700_000  # reference-net parameter count
    gib = 1024 ** 3
    # the reference's own training config (2048×1024 batch 8) on a 16 GiB
    # chip: accum1/accum2 RESOURCE_EXHAUSTED on real hardware, accum4 ran
    # (logs/bench_train_r4.jsonl) — the calibrated governor must agree
    a = find_accum_steps(n, 8, 1024, 2048, "adamw", hbm_bytes=16 * gib)
    assert a == 4, a
    est = estimate_memory_usage(n, 8 // a, 1024, 2048)
    assert est["total"] * 1.2 <= 16 * gib
    # a smaller split must NOT have fit (minimality)
    smaller = [d for d in range(1, a) if 8 % d == 0]
    for d in smaller:
        est_d = estimate_memory_usage(n, 8 // d, 1024, 2048)
        assert est_d["total"] * 1.2 > 16 * gib
    # plenty of HBM → no split
    assert find_accum_steps(n, 8, 64, 64, "adamw", hbm_bytes=2 * gib) == 1


def test_accum_skip_guard_still_engages():
    """A non-finite microbatch poisons the accumulated gradient → the whole
    update is skipped, exactly like the accum=1 guard."""
    cfg = Config(num_epochs=4, warmup_epochs=1, grad_accum_steps=2,
                 normalization="none", dropout_rate=0.0)
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                 normalization="none", dropout_rate=0.0)
    state, step = _state_and_step(cfg, model)
    x, y = _batch(4)
    x = x.at[3].set(jnp.nan)
    new_state, metrics = step(state, x, y, jax.random.PRNGKey(0))
    assert int(metrics["skipped"]) == 1
    assert int(new_state.skipped_steps) == 1
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 jax.device_get(new_state.params),
                 jax.device_get(state.params))
