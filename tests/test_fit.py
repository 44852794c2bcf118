"""End-to-end training: synthetic packs → fit → loss decreases → checkpoint
→ resume.  The reference's whole main.py flow (SURVEY.md §3.1) in miniature,
plus resume which the reference lacks."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.data import Loader, PackedDataset, compute_channel_stats
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.train import fit


@pytest.fixture(scope="module")
def packs(tmp_path_factory):
    """Synthetic learnable task: label = sigmoid-ish function of inputs."""
    out = str(tmp_path_factory.mktemp("fitdata"))
    rng = np.random.default_rng(0)
    n, h, w = 8, 16, 16
    x = rng.standard_normal((n, h, w, 4)).astype(np.float32)
    y = (x.mean(axis=-1, keepdims=True) > 0).astype(np.float32)
    np.save(os.path.join(out, "train_inputs.npy"), x)
    np.save(os.path.join(out, "train_labels.npy"), y)
    np.save(os.path.join(out, "val_inputs.npy"), x[:4])
    np.save(os.path.join(out, "val_labels.npy"), y[:4])
    compute_channel_stats(out, "train", layout="nhwc")
    return out


def test_fit_end_to_end(packs, tmp_path, cpus):
    cfg = Config(batch_size=4, num_epochs=3, warmup_epochs=1,
                 learning_rate=3e-3, validation_frequency=1, save_frequency=1,
                 data_parallel=1, spatial_parallel=1,
                 log_dir=str(tmp_path / "logs"))
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32, dropout_rate=0.1)
    train_loader = Loader(PackedDataset(packs, "train"), cfg.batch_size,
                          shuffle=True, seed=0)
    val_loader = Loader(PackedDataset(packs, "val"), 4, shuffle=False)
    result = fit(cfg, model, train_loader, val_loader, devices=cpus[:1],
                 checkpoint_dir=str(tmp_path / "ckpt"), log_every=1)
    assert len(result.history) == 3
    first = result.history[0]["train"]["total_loss"]
    last = result.history[-1]["train"]["total_loss"]
    assert last < first
    assert result.history[0]["val"] is not None
    assert np.isfinite(result.best_val_loss)
    # checkpoints written
    assert os.path.isdir(tmp_path / "ckpt")

    # resume: continuing picks up at epoch 3
    cfg2 = cfg.replace(num_epochs=4)
    result2 = fit(cfg2, model, train_loader, val_loader, devices=cpus[:1],
                  checkpoint_dir=str(tmp_path / "ckpt"), log_every=1)
    assert len(result2.history) == 1  # only epoch 3 ran
    assert result2.history[0]["epoch"] == 3


def test_fit_multidevice(packs, tmp_path, cpus):
    cfg = Config(batch_size=8, num_epochs=2, warmup_epochs=1,
                 learning_rate=3e-3, validation_frequency=1,
                 data_parallel=4, spatial_parallel=2, resume=False,
                 log_dir=str(tmp_path / "logs2"))
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32, dropout_rate=0.0)
    train_loader = Loader(PackedDataset(packs, "train"), cfg.batch_size,
                          shuffle=True, seed=0)
    result = fit(cfg, model, train_loader, None, devices=cpus,
                 checkpoint_dir=str(tmp_path / "ckpt2"), log_every=1)
    assert len(result.history) == 2
    assert np.isfinite(result.history[-1]["train"]["total_loss"])
