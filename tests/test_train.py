"""Training runtime tests: schedules, jitted step semantics, skip-guard,
end-to-end fit on a synthetic dataset, checkpoint save/resume.

The reference has no tests for any of this (SURVEY.md §4); these pin the
behaviors its training loop implements inline (main.py:132-581)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.losses import LossBundle, PerceptualLoss
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.train import (
    build_eval_step, build_train_step, clip_norm_for_step, create_train_state,
    warmup_cosine_schedule,
)
from pcss_unet_tpu.train.checkpoint import CheckpointManagerWrapper


TINY = dict(encoder_widths=(8, 16), dtype=jnp.float32)


def tiny_cfg(**kw):
    base = dict(batch_size=2, num_epochs=4, warmup_epochs=1,
                learning_rate=1e-3, input_channels=4, output_channels=1,
                loss_type="standard", vgg_weights_path="", alpha=0.9,
                data_parallel=1, spatial_parallel=1)
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def bundle():
    return LossBundle(perceptual=PerceptualLoss(None, taps=(2,),
                                                tap_weights=(1.0,)))


def test_warmup_cosine_matches_reference_curve():
    """Reference lambda (main.py:959-969): linear warmup over warmup_epochs,
    cosine to 1% floor — checked at epoch boundaries."""
    spe = 10
    sched = warmup_cosine_schedule(7e-4, warmup_epochs=5, num_epochs=200,
                                   steps_per_epoch=spe)
    # mid-warmup: epoch 2.5 → factor 0.5
    assert abs(float(sched(25)) / 7e-4 - 0.5) < 1e-6
    # warmup end
    assert abs(float(sched(50)) / 7e-4 - 1.0) < 1e-6
    # cosine midpoint: (5+200)/2 epochs in → factor 0.5
    mid = (50 + 2000) // 2
    assert abs(float(sched(mid)) / 7e-4 - 0.5) < 0.02
    # floor
    assert float(sched(1999)) / 7e-4 >= 0.01 - 1e-9
    assert float(sched(1990)) / 7e-4 == pytest.approx(0.01, rel=0.2)


def test_clip_schedule():
    """main.py:356-358: 1.0 first half, then max(0.1, 1 − epoch_ratio)."""
    spe, ne = 10, 100
    assert float(clip_norm_for_step(0, spe, ne)) == 1.0
    assert float(clip_norm_for_step(49 * spe, spe, ne)) == 1.0
    assert abs(float(clip_norm_for_step(60 * spe, spe, ne)) - 0.4) < 1e-6
    assert float(clip_norm_for_step(99 * spe, spe, ne)) == pytest.approx(0.1, abs=1e-6)
    assert float(clip_norm_for_step(99 * spe, spe, ne, enabled=False)) == 1.0


@pytest.fixture(scope="module")
def setup(bundle):
    cfg = tiny_cfg()
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32)
    state = create_train_state(model, cfg, steps_per_epoch=4,
                               sample_shape=(2, 16, 16, 4))
    means = np.zeros(4, np.float32)
    stds = np.ones(4, np.float32)
    step_fn = jax.jit(build_train_step(cfg, bundle, means, stds, 4),
                      donate_argnums=(0,))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    y = jnp.asarray(rng.random((2, 16, 16, 1)).astype(np.float32))
    return cfg, model, state, step_fn, x, y, bundle, means, stds


def test_train_step_updates_and_decreases(setup):
    cfg, model, state, step_fn, x, y, bundle, means, stds = setup
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        state, metrics = step_fn(state, x, y, key)
        losses.append(float(metrics["total_loss"]))
    assert int(state.step) == 30
    assert int(state.skipped_steps) == 0
    assert losses[-1] < losses[0], f"loss did not decrease: {losses[0]} → {losses[-1]}"
    assert np.isfinite(losses).all()


def test_nonfinite_batch_skipped(setup, bundle):
    """NaN input → loss goes NaN → update must be skipped, params kept
    (replaces main.py:240-246's host-side screen)."""
    cfg, model, _, _, x, y, _, means, stds = setup
    state = create_train_state(model, cfg, 4, (2, 16, 16, 4))
    step_fn = jax.jit(build_train_step(cfg, bundle, means, stds, 4))
    bad_x = x.at[0, 0, 0, 0].set(jnp.nan)
    params_before = jax.device_get(state.params)
    new_state, metrics = step_fn(state, bad_x, y, jax.random.PRNGKey(0))
    assert int(metrics["skipped"]) == 1
    assert int(new_state.skipped_steps) == 1
    after = jax.device_get(new_state.params)
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    # a good batch afterwards still trains
    new_state2, m2 = step_fn(new_state, x, y, jax.random.PRNGKey(0))
    assert int(m2["skipped"]) == 0


def test_grad_clip_applied(setup, bundle):
    cfg, model, _, _, x, y, _, means, stds = setup
    state = create_train_state(model, cfg, 4, (2, 16, 16, 4))
    step_fn = jax.jit(build_train_step(cfg, bundle, means, stds, 4))
    _, metrics = step_fn(state, x * 1e6, y, jax.random.PRNGKey(0))
    # huge inputs → huge raw grad norm reported, but update survived clip
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["clip_max_norm"]) == 1.0


def test_eval_step(setup, bundle):
    cfg, model, state0, _, x, y, _, means, stds = setup
    state = create_train_state(model, cfg, 4, (2, 16, 16, 4))
    eval_fn = jax.jit(build_eval_step(cfg, bundle, means, stds))
    terms, out = eval_fn(state, x, y)
    assert out.shape == (2, 16, 16, 1)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
    assert float(terms["perturbation_loss"]) == 0.0
    # deterministic (no dropout in eval)
    terms2, out2 = eval_fn(state, x, y)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_perturb_loss_type_trains(bundle):
    """--loss_type perturb crashes in the reference (pert_loss.py:111);
    here it must actually train."""
    cfg = tiny_cfg(loss_type="perturb", perturb_weight=0.1,
                   perturbation_count=2)
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32)
    state = create_train_state(model, cfg, 4, (2, 16, 16, 4))
    b = LossBundle(perceptual=PerceptualLoss(None, taps=(2,), tap_weights=(1.0,)),
                   perturb_weight=0.1, perturbation_count=2)
    step_fn = jax.jit(build_train_step(cfg, b, np.zeros(4, np.float32),
                                       np.ones(4, np.float32), 4))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    y = jnp.asarray(rng.random((2, 16, 16, 1)).astype(np.float32))
    state, metrics = step_fn(state, x, y, jax.random.PRNGKey(0))
    assert float(metrics["perturbation_loss"]) >= 0.0
    assert np.isfinite(float(metrics["total_loss"]))


def test_checkpoint_save_restore(tmp_path, setup, bundle):
    cfg, model, _, _, x, y, _, means, stds = setup
    state = create_train_state(model, cfg, 4, (2, 16, 16, 4))
    step_fn = jax.jit(build_train_step(cfg, bundle, means, stds, 4))
    for _ in range(3):
        state, _ = step_fn(state, x, y, jax.random.PRNGKey(0))
    mgr = CheckpointManagerWrapper(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(state, {"val_loss": 0.5}, epoch=0)
    mgr.wait()
    fresh = create_train_state(model, cfg, 4, (2, 16, 16, 4), seed=123)
    restored, cursor = mgr.restore(fresh)
    assert int(restored.step) == 3
    assert cursor == -1  # no mid-epoch cursor on a normal save
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(a, b)
    assert mgr.best_epoch() == 0
    mgr.close()


def test_optimizer_variants():
    from pcss_unet_tpu.train.state import make_optimizer
    for opt in ("adam", "adamw", "sgd"):
        cfg = tiny_cfg(optimizer_type=opt)
        tx = make_optimizer(cfg, steps_per_epoch=4)
        params = {"w": jnp.ones((3, 3))}
        opt_state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((3, 3)) * 0.1}, opt_state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()
    with pytest.raises(ValueError):
        make_optimizer(tiny_cfg(optimizer_type="bogus"), 4)


def test_checkpoint_subkey_wrap_never_deletes_before_write(tmp_path, setup):
    """The epoch sub-key counter wraps after _SUBKEYS re-saves of one epoch
    (repeated mid-epoch preemptions).  The wrap must (a) stay inside the
    epoch's key range, (b) reuse a free sub-key rather than delete the
    still-newest save first — a SIGKILL at any instant leaves a restorable
    checkpoint — and (c) keep restore pointing at the newest payload once
    the post-commit cleanup runs."""
    cfg, model, _, _, _, _, _, _, _ = setup
    mgr = CheckpointManagerWrapper(str(tmp_path / "ckpt"), max_to_keep=3)
    mgr._SUBKEYS = 4  # make the wrap reachable

    calls = []
    real_save, real_delete = mgr.manager.save, mgr.manager.delete
    mgr.manager.save = lambda *a, **k: (calls.append(("save", a[0])),
                                        real_save(*a, **k))[1]
    mgr.manager.delete = lambda s: (calls.append(("delete", s)),
                                    real_delete(s))[1]

    state = create_train_state(model, cfg, 4, (2, 16, 16, 4))
    for i in range(6):   # 6 > _SUBKEYS: forces the wrap on save #5
        state = state.replace(step=state.step + 1)
        mgr.save(state, {}, epoch=0, cursor_batch=i)
        mgr.wait()
        steps = mgr.manager.all_steps() or []
        # (a) never spills into epoch 1's key range
        assert all(0 <= s < 4 for s in steps), steps
        assert mgr.latest_epoch() == 0

    # (b) on every save, the new write committed before any delete ran
    for n, (op, key) in enumerate(calls):
        if op == "delete":
            saved_before = [k for o, k in calls[:n] if o == "save"]
            assert saved_before and key != saved_before[-1]

    # (c) the surviving checkpoint is the 6th (newest) payload
    fresh = create_train_state(model, cfg, 4, (2, 16, 16, 4), seed=9)
    restored, cursor = mgr.restore(fresh)
    assert int(restored.step) == int(state.step)
    assert cursor == 5
    # epoch addressing still intact after the wrap
    mgr.save(state, {"val_loss": 0.3}, epoch=1)
    mgr.wait()
    assert mgr.latest_epoch() == 1
    mgr.close()


def test_checkpoint_resave_older_epoch_not_skipped(tmp_path, setup):
    """After resuming from an older epoch (e.g. best-val rollback), the next
    save targets a step key below Orbax's latest_step — which Orbax silently
    skips unless forced.  The wrapper must still durably write it."""
    cfg, model, _, _, _, _, _, _, _ = setup
    mgr = CheckpointManagerWrapper(str(tmp_path / "ckpt"), max_to_keep=5)
    state = create_train_state(model, cfg, 4, (2, 16, 16, 4))
    mgr.save(state, {"val_loss": 0.5}, epoch=0)
    mgr.save(state, {"val_loss": 0.4}, epoch=2)
    mgr.wait()
    state = state.replace(step=state.step + 7)
    mgr.save(state, {"val_loss": 0.45}, epoch=1)   # rollback re-save
    mgr.wait()
    fresh = create_train_state(model, cfg, 4, (2, 16, 16, 4), seed=9)
    restored, _ = mgr.restore(fresh, epoch=1)
    assert int(restored.step) == int(state.step)
    mgr.close()
