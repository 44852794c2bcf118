"""EMA of the parameters (cfg.ema_decay): step update math, skip-guard
interaction, checkpoint round-trip, legacy-checkpoint seeding, and the
--ema deployment path through load_variables."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.losses import LossBundle, PerceptualLoss
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.train import build_train_step, create_train_state
from pcss_unet_tpu.train.checkpoint import CheckpointManagerWrapper

HW = 16


def _bundle(cfg):
    return LossBundle(
        perceptual=PerceptualLoss(None, taps=(2, 7), tap_weights=(0.5, 0.5)),
        alpha=cfg.alpha)


def _setup(cfg):
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                 normalization="none", dropout_rate=0.0)
    state = create_train_state(model, cfg, steps_per_epoch=4,
                               sample_shape=(2, HW, HW, 4))
    step = jax.jit(build_train_step(cfg, _bundle(cfg),
                                    np.zeros(4, np.float32),
                                    np.ones(4, np.float32),
                                    steps_per_epoch=4))
    return state, step


def _batch(batch=2, nan=False):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((batch, HW, HW, 4)).astype(np.float32)
    if nan:
        x[0, 0, 0, 0] = np.nan
    y = rng.random((batch, HW, HW, 1)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_ema_update_math():
    d = 0.9
    cfg = Config(num_epochs=4, warmup_epochs=1, dropout_rate=0.0,
                 normalization="none", ema_decay=d)
    state, step = _setup(cfg)
    p0 = jax.device_get(state.params)
    assert state.ema_params is not None
    jax.tree.map(np.testing.assert_array_equal, jax.device_get(state.ema_params), p0)
    # equal values but distinct buffers: fit() donates the state, and
    # aliased leaves would donate the same buffer twice
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state.ema_params)):
        assert a is not b

    x, y = _batch()
    new_state, _ = step(state, x, y, jax.random.PRNGKey(0))
    p1 = jax.device_get(new_state.params)
    ema1 = jax.device_get(new_state.ema_params)
    jax.tree.map(
        lambda e, a, b: np.testing.assert_allclose(e, d * a + (1 - d) * b,
                                                   rtol=1e-6, atol=1e-7),
        ema1, p0, p1)


def test_ema_untouched_on_skipped_step():
    cfg = Config(num_epochs=4, warmup_epochs=1, dropout_rate=0.0,
                 normalization="none", ema_decay=0.9)
    state, step = _setup(cfg)
    x, y = _batch(nan=True)
    new_state, metrics = step(state, x, y, jax.random.PRNGKey(0))
    assert int(metrics["skipped"]) == 1
    jax.tree.map(np.testing.assert_array_equal,
                 jax.device_get(new_state.ema_params),
                 jax.device_get(state.ema_params))


def test_ema_off_keeps_legacy_state_shape():
    cfg = Config(num_epochs=4, warmup_epochs=1, dropout_rate=0.0,
                 normalization="none")
    state, step = _setup(cfg)
    assert state.ema_params is None
    x, y = _batch()
    new_state, _ = step(state, x, y, jax.random.PRNGKey(0))
    assert new_state.ema_params is None


def test_ema_checkpoint_roundtrip_and_infer(tmp_path):
    cfg = Config(num_epochs=4, warmup_epochs=1, dropout_rate=0.0,
                 normalization="none", ema_decay=0.5)
    state, step = _setup(cfg)
    x, y = _batch()
    state, _ = step(state, x, y, jax.random.PRNGKey(0))

    ckdir = str(tmp_path / "ck")
    mgr = CheckpointManagerWrapper(ckdir)
    mgr.save(state, {"train_loss": 1.0}, epoch=0)
    mgr.wait()

    template, _ = _setup(cfg)
    restored, cursor = mgr.restore(template)
    assert cursor == -1
    jax.tree.map(np.testing.assert_array_equal,
                 jax.device_get(restored.ema_params),
                 jax.device_get(state.ema_params))
    mgr.close()

    # --ema deployment path
    from pcss_unet_tpu.infer import load_variables

    step_dirs = [d for d in os.listdir(ckdir) if d.isdigit()]
    v = load_variables(ckdir, ema=True)
    jax.tree.map(np.testing.assert_array_equal, v["params"],
                 jax.device_get(state.ema_params))
    assert step_dirs  # sanity: the manager laid out step dirs


def test_ema_seeded_when_checkpoint_predates_it(tmp_path):
    """Resume an EMA-off run's checkpoint with ema_decay>0: the EMA seeds
    from the restored raw params instead of failing."""
    off = Config(num_epochs=4, warmup_epochs=1, dropout_rate=0.0,
                 normalization="none")
    state, step = _setup(off)
    x, y = _batch()
    state, _ = step(state, x, y, jax.random.PRNGKey(0))
    ckdir = str(tmp_path / "ck")
    mgr = CheckpointManagerWrapper(ckdir)
    mgr.save(state, {"train_loss": 1.0}, epoch=0)
    mgr.wait()
    mgr.close()

    on = off.replace(ema_decay=0.9)
    template, _ = _setup(on)
    mgr2 = CheckpointManagerWrapper(ckdir)
    restored, _ = mgr2.restore(template)
    mgr2.close()
    jax.tree.map(np.testing.assert_array_equal,
                 jax.device_get(restored.ema_params),
                 jax.device_get(restored.params))


def test_ema_checkpoint_loads_with_ema_disabled(tmp_path):
    """The reverse migration: an EMA run's checkpoint restores into an
    EMA-off state (extra saved subtree must not break the template)."""
    on = Config(num_epochs=4, warmup_epochs=1, dropout_rate=0.0,
                normalization="none", ema_decay=0.5)
    state, step = _setup(on)
    x, y = _batch()
    state, _ = step(state, x, y, jax.random.PRNGKey(0))
    ckdir = str(tmp_path / "ck")
    mgr = CheckpointManagerWrapper(ckdir)
    mgr.save(state, {"train_loss": 1.0}, epoch=0)
    mgr.wait()
    mgr.close()

    template, _ = _setup(on.replace(ema_decay=0.0))
    mgr2 = CheckpointManagerWrapper(ckdir)
    restored, _ = mgr2.restore(template)
    mgr2.close()
    assert restored.ema_params is None
    jax.tree.map(np.testing.assert_array_equal,
                 jax.device_get(restored.params),
                 jax.device_get(state.params))


def test_fit_logs_ema_validation(tmp_path, cpus):
    """fit() with ema_decay>0 runs a second validation pass on the EMA
    weights and reports it as val total_loss_ema."""
    from pcss_unet_tpu.data import Loader, PackedDataset, compute_channel_stats
    from pcss_unet_tpu.train import fit

    out = str(tmp_path / "packs")
    os.makedirs(out)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, HW, HW, 4)).astype(np.float32)
    y = (x.mean(axis=-1, keepdims=True) > 0).astype(np.float32)
    np.save(os.path.join(out, "train_inputs.npy"), x)
    np.save(os.path.join(out, "train_labels.npy"), y)
    np.save(os.path.join(out, "val_inputs.npy"), x[:4])
    np.save(os.path.join(out, "val_labels.npy"), y[:4])
    compute_channel_stats(out, "train", layout="nhwc")

    cfg = Config(batch_size=4, num_epochs=2, warmup_epochs=1,
                 validation_frequency=1, ema_decay=0.9,
                 log_dir=str(tmp_path / "logs"))
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32)
    result = fit(cfg, model,
                 Loader(PackedDataset(out, "train"), 4, shuffle=True, seed=0),
                 Loader(PackedDataset(out, "val"), 4, shuffle=False),
                 devices=cpus[:1], log_every=1,
                 checkpoint_dir=str(tmp_path / "ckpt"))
    v = result.history[0]["val"]
    assert v is not None and "total_loss_ema" in v
    assert np.isfinite(v["total_loss_ema"])
    assert result.state.ema_params is not None


def test_ema_load_variables_errors(tmp_path):
    from pcss_unet_tpu.infer import load_variables

    with pytest.raises(ValueError, match="ema"):
        load_variables(str(tmp_path / "x.npz"), ema=True)
