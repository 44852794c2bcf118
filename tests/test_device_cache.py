"""Device-resident dataset cache (data/device_cache.py).

The cache must be a pure data-path optimization: batches gathered on device
must be bit-identical to the host streaming path (same shuffle order, same
crop offsets — both consume ``Loader.epoch_indices``), and a training run
through ``fit()`` must produce the same trajectory either way.
"""

import json
import os

import jax
import numpy as np
import pytest

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.data.device_cache import (
    DeviceCache, cache_eligible, dataset_nbytes,
)
from pcss_unet_tpu.data.pipeline import Loader, PackedDataset


def _make_packs(root, n=10, h=32, w=48, layout="nhwc"):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((n, h, w, 4)).astype(np.float32)
    y = rng.random((n, h, w, 1)).astype(np.float32)
    if layout == "nchw":
        np.save(os.path.join(root, "train_inputs.npy"), x.transpose(0, 3, 1, 2))
        np.save(os.path.join(root, "train_labels.npy"), y.transpose(0, 3, 1, 2))
    else:
        np.save(os.path.join(root, "train_inputs.npy"), x)
        np.save(os.path.join(root, "train_labels.npy"), y)
    with open(os.path.join(root, "train_meta.json"), "w") as f:
        json.dump({"layout": layout}, f)
    np.save(os.path.join(root, "train_stats.npy"),
            {"means": [0.0] * 4, "stds": [1.0] * 4}, allow_pickle=True)


@pytest.mark.parametrize("layout", ["nhwc", "nchw"])
def test_cached_batches_match_host_path(tmp_path, layout):
    _make_packs(tmp_path, layout=layout)
    ds = PackedDataset(str(tmp_path), "train")
    loader = Loader(ds, batch_size=4, shuffle=True, seed=3)
    cache = DeviceCache(ds, upload_chunk=3)
    host = list(loader.epoch(1))
    dev = list(cache.batches(loader, 1))
    assert len(host) == len(dev) == 2
    for (hx, hy), (dx, dy) in zip(host, dev):
        np.testing.assert_array_equal(hx, np.asarray(dx))
        np.testing.assert_array_equal(hy, np.asarray(dy))


def test_cached_crop_batches_match_host_path(tmp_path):
    _make_packs(tmp_path)
    ds = PackedDataset(str(tmp_path), "train")
    loader = Loader(ds, batch_size=4, shuffle=True, seed=9, crop_hw=(16, 16))
    cache = DeviceCache(ds, crop_hw=(16, 16))
    for (hx, hy), (dx, dy) in zip(loader.epoch(2), cache.batches(loader, 2)):
        np.testing.assert_array_equal(hx, np.asarray(dx))
        np.testing.assert_array_equal(hy, np.asarray(dy))


def test_cache_eligibility_policy(tmp_path):
    _make_packs(tmp_path)
    ds = PackedDataset(str(tmp_path), "train")
    assert dataset_nbytes(ds) == 10 * 32 * 48 * 5 * 4
    assert cache_eligible(Config(device_data_cache="auto"), ds)
    assert not cache_eligible(Config(device_data_cache="off"), ds)
    tiny = Config(device_data_cache="auto", device_cache_budget_mb=0)
    assert not cache_eligible(tiny, ds)
    forced = Config(device_data_cache="on", device_cache_budget_mb=0)
    assert cache_eligible(forced, ds)


def test_fit_trajectory_identical_cached_vs_streamed(tmp_path, cpus):
    """End-to-end: two fit() runs — cache on vs off — same loss history."""
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.train.loop import fit

    _make_packs(tmp_path, n=8, h=32, w=32)

    class NullWriter:
        def scalar(self, *a, **k): pass
        def image(self, *a, **k): pass
        def flush(self): pass

    def run(cache_mode):
        ds = PackedDataset(str(tmp_path), "train")
        loader = Loader(ds, batch_size=4, shuffle=True, seed=1)
        cfg = Config(batch_size=4, num_epochs=2, warmup_epochs=1,
                     loss_type="standard", device_data_cache=cache_mode,
                     save_dir="", log_dir="")
        model = UNet(encoder_widths=(8, 16), dtype=jax.numpy.float32)
        res = fit(cfg, model, loader, None, writer=NullWriter(),
                  devices=cpus[:1], checkpoint_dir=None,
                  install_preemption_handler=False)
        return [e["train"]["total_loss"] for e in res.history]

    np.testing.assert_allclose(run("on"), run("off"), rtol=1e-6)
