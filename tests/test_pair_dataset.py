"""PairDataset (lazy on-the-fly pairs — reference LiverDataset role,
setdata.py:138-205) and the extended check-CLI diagnostics."""

import os

import numpy as np
import pytest
from PIL import Image

from pcss_unet_tpu.cli import check as cli_check
from pcss_unet_tpu.data import Loader, PairDataset
from pcss_unet_tpu.io.exr import write_exr


@pytest.fixture(scope="module")
def pair_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pairs")
    rng = np.random.default_rng(0)
    for i in range(6):
        chans = {n: rng.standard_normal((20, 28)).astype(np.float32)
                 for n in "RGBA"}
        write_exr(str(root / f"s{i}_input.exr"), chans)
        # label PNG at a DIFFERENT size → NEAREST resize path
        # (setdata.py:164-168)
        lbl = (rng.random((10, 14)) * 255).astype(np.uint8)
        Image.fromarray(lbl, "L").save(root / f"s{i}_gt.png")
    return str(root)


def test_pair_dataset_basic(pair_dir):
    ds = PairDataset(pair_dir)
    assert len(ds) == 6
    x, y = ds[0]
    assert x.shape == (20, 28, 4) and y.shape == (20, 28, 1)
    assert 0.0 <= y.min() and y.max() <= 1.0
    assert ds.sample_hw == (20, 28)


def test_pair_dataset_with_loader(pair_dir):
    loader = Loader(PairDataset(pair_dir), batch_size=2, shuffle=True, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    x, y = batches[0]
    assert x.shape == (2, 20, 28, 4) and y.shape == (2, 20, 28, 1)


def test_check_pair_compare_decodes(pair_dir, capsys):
    with pytest.raises(SystemExit) as e:
        cli_check.main(["pair", "--exr", f"{pair_dir}/s0_input.exr",
                        "--png", f"{pair_dir}/s0_gt.png",
                        "--compare_decodes"])
    assert e.value.code == 0
    assert "decode A/B" in capsys.readouterr().out


def test_check_packs_histogram(pair_dir, tmp_path, capsys):
    from pcss_unet_tpu.data import build_packs

    out = str(tmp_path / "p")
    build_packs(pair_dir, out, "train")
    with pytest.raises(SystemExit) as e:
        cli_check.main(["packs", "--dataset_path", out, "--max_samples", "2",
                        "--histogram", str(tmp_path / "h.png")])
    assert e.value.code == 0
    assert os.path.exists(tmp_path / "h.png")


def test_perturbation_orphan_variant(rng):
    """fixed-eps + MSE mode (the orphaned EnhancedCustomLoss,
    customLoss.py:195-238)."""
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.losses.perturbation import perturbation_loss

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    out = jnp.asarray(rng.random((2, 16, 16, 1)).astype(np.float32))

    def fake_model(z):
        return jnp.mean(z, axis=-1, keepdims=True) * 0.1 + 0.5

    v = perturbation_loss(fake_model, jax.random.PRNGKey(0), x, out,
                          count=1, std_factor=0.01, noise_mode="fixed_eps",
                          metric="mse")
    assert float(v) >= 0.0 and np.isfinite(float(v))
