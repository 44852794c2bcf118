"""Grain-backed loader: Loader-interface compatibility, reshuffling,
sharding, and a fit() run."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.data import PackedDataset
from pcss_unet_tpu.data.grain_pipeline import GrainLoader
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.train import fit


@pytest.fixture(scope="module")
def packs(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gdata"))
    rng = np.random.default_rng(0)
    np.save(os.path.join(out, "train_inputs.npy"),
            rng.standard_normal((10, 16, 16, 4)).astype(np.float32))
    np.save(os.path.join(out, "train_labels.npy"),
            rng.random((10, 16, 16, 1)).astype(np.float32))
    return out


def test_grain_loader_batches(packs):
    loader = GrainLoader(PackedDataset(packs, "train"), batch_size=4,
                         shuffle=True, seed=0)
    assert loader.batches_per_epoch() == 2
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    x, y = batches[0]
    assert x.shape == (4, 16, 16, 4) and y.shape == (4, 16, 16, 1)
    # reshuffles across epochs, deterministic per epoch
    e0 = [float(b[0][0, 0, 0, 0]) for b in loader.epoch(0)]
    e1 = [float(b[0][0, 0, 0, 0]) for b in loader.epoch(1)]
    e0b = [float(b[0][0, 0, 0, 0]) for b in loader.epoch(0)]
    assert e0 == e0b and e0 != e1


def test_grain_loader_sharding(packs):
    ds = PackedDataset(packs, "train")
    l0 = GrainLoader(ds, 2, shuffle=False, shard_index=0, shard_count=2)
    l1 = GrainLoader(ds, 2, shuffle=False, shard_index=1, shard_count=2)
    n0 = sum(x.shape[0] for x, _ in l0.epoch(0))
    n1 = sum(x.shape[0] for x, _ in l1.epoch(0))
    assert n0 == n1 == 4


def test_fit_with_grain_loader(packs, tmp_path, cpus):
    cfg = Config(batch_size=4, num_epochs=2, warmup_epochs=1,
                 data_parallel=1, spatial_parallel=1, resume=False,
                 log_dir=str(tmp_path / "logs"))
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32)
    loader = GrainLoader(PackedDataset(packs, "train"), cfg.batch_size,
                         shuffle=True, seed=0)
    result = fit(cfg, model, loader, None, devices=cpus[:1],
                 checkpoint_dir=str(tmp_path / "ck"), log_every=100,
                 install_preemption_handler=False)
    assert len(result.history) == 2
    assert np.isfinite(result.history[-1]["train"]["total_loss"])
