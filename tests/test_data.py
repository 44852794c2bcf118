"""Data layer tests: organize → pack → stats → load, on a synthetic scene.

Covers the full artifact contract chain of SURVEY.md §1 (the "wire format"):
raw scene dir → split dirs → packed .npy → train_stats.npy → batches."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pcss_unet_tpu.data import (
    Loader, PackedDataset, build_packs, compute_channel_stats,
    discover_pairs, load_channel_stats, organize_dataset, replace_exr_files,
)
from pcss_unet_tpu.io.exr import write_exr


H, W, N = 16, 24, 12


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    exr_dir = root / "conditioning_images"
    png_dir = root / "images"
    exr_dir.mkdir()
    png_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(N):
        chans = {n: rng.standard_normal((H, W)).astype(np.float32) * (k + 1)
                 for k, n in enumerate("RGBA")}
        write_exr(str(exr_dir / f"frame{i:03d}.exr"), chans)
        label = (rng.random((H, W)) * 255).astype(np.uint8)
        Image.fromarray(label, "L").save(png_dir / f"frame{i:03d}.png")
    return str(root)


@pytest.fixture(scope="module")
def split_dir(scene, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("splits"))
    counts = organize_dataset(scene, out, train_fraction=0.75, seed=1)
    assert counts["train"] == 9 and counts["val"] == 3
    return out


def test_organize_naming(split_dir):
    pairs = discover_pairs(os.path.join(split_dir, "train"))
    assert len(pairs) == 9
    for exr, png in pairs:
        assert exr.endswith("_input.exr") and png.endswith("_gt.png")


def test_replace_exr(split_dir, scene, tmp_path):
    n = replace_exr_files(os.path.join(split_dir, "val"),
                          os.path.join(scene, "conditioning_images"))
    assert n == 3


@pytest.fixture(scope="module")
def packs(split_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("processed"))
    meta_t = build_packs(os.path.join(split_dir, "train"), out, "train")
    meta_v = build_packs(os.path.join(split_dir, "val"), out, "val")
    assert meta_t["count"] == 9 and meta_v["count"] == 3
    return out


def test_pack_shapes(packs):
    x = np.load(os.path.join(packs, "train_inputs.npy"), mmap_mode="r")
    y = np.load(os.path.join(packs, "train_labels.npy"), mmap_mode="r")
    assert x.shape == (9, H, W, 4) and y.shape == (9, H, W, 1)
    assert y.min() >= 0.0 and y.max() <= 1.0


def test_stats_match_numpy(packs):
    stats = compute_channel_stats(packs, "train", chunk=4)
    x = np.load(os.path.join(packs, "train_inputs.npy"))
    ref_means = x.astype(np.float64).mean(axis=(0, 1, 2))
    ref_stds = x.astype(np.float64).std(axis=(0, 1, 2))
    np.testing.assert_allclose(stats["means"], ref_means, rtol=1e-5)
    np.testing.assert_allclose(stats["stds"], ref_stds, rtol=1e-5)
    # reference artifact format: pickled dict in train_stats.npy
    means, stds = load_channel_stats(packs)
    np.testing.assert_allclose(means, ref_means, rtol=1e-5)
    assert os.path.exists(os.path.join(packs, "train_stats.json"))


def test_loader_shuffles_and_shards(packs):
    ds = PackedDataset(packs, "train")
    loader = Loader(ds, batch_size=2, shuffle=True, seed=3)
    e0 = [x[0, 0, 0, 0] for x, _ in loader.epoch(0)]
    e1 = [x[0, 0, 0, 0] for x, _ in loader.epoch(1)]
    assert e0 != e1, "epochs should reshuffle"
    # determinism
    e0b = [x[0, 0, 0, 0] for x, _ in loader.epoch(0)]
    assert e0 == e0b
    # sharding partitions the data
    l0 = Loader(ds, batch_size=2, shuffle=False, shard_index=0, shard_count=2)
    l1 = Loader(ds, batch_size=2, shuffle=False, shard_index=1, shard_count=2)
    n0 = sum(x.shape[0] for x, _ in l0.epoch(0))
    n1 = sum(x.shape[0] for x, _ in l1.epoch(0))
    assert n0 == n1 == 4  # 9 samples → 4 each after drop_remainder

def test_nchw_pack_compat(split_dir, tmp_path):
    """Reference-layout packs load identically (artifact compatibility)."""
    out = str(tmp_path / "nchw")
    build_packs(os.path.join(split_dir, "train"), out, "train", layout="nchw")
    x = np.load(os.path.join(out, "train_inputs.npy"), mmap_mode="r")
    assert x.shape == (9, 4, H, W)
    ds = PackedDataset(out, "train")
    xi, yi = ds[0]
    assert xi.shape == (H, W, 4) and yi.shape == (H, W, 1)
    # stats work on nchw too
    stats = compute_channel_stats(out, "train")
    full = np.load(os.path.join(out, "train_inputs.npy"))
    np.testing.assert_allclose(
        stats["means"], full.astype(np.float64).mean(axis=(0, 2, 3)), rtol=1e-5)


def test_nchw_autodetect_without_meta(split_dir, tmp_path):
    out = str(tmp_path / "nometa")
    build_packs(os.path.join(split_dir, "train"), out, "train", layout="nchw")
    os.remove(os.path.join(out, "train_meta.json"))
    ds = PackedDataset(out, "train")
    assert ds.layout == "nchw"
    assert ds.sample_hw == (H, W)


def test_loader_random_crop(packs):
    """256²-crop-style training (BASELINE config 1): same window applied to
    input and label, seeded per epoch."""
    ds = PackedDataset(packs, "train")
    loader = Loader(ds, batch_size=2, shuffle=False, crop_hw=(8, 8), seed=5)
    x, y = next(iter(loader.epoch(0)))
    assert x.shape == (2, 8, 8, 4) and y.shape == (2, 8, 8, 1)
    # input/label crops align: re-derive from the full sample
    full_x, full_y = ds.gather(np.array([0, 1]))
    found = False
    for oy in range(full_x.shape[1] - 7):
        for ox in range(full_x.shape[2] - 7):
            if np.array_equal(full_x[0, oy:oy + 8, ox:ox + 8], x[0]):
                np.testing.assert_array_equal(
                    full_y[0, oy:oy + 8, ox:ox + 8], y[0])
                found = True
    assert found
    # deterministic per epoch, different across epochs
    x0b, _ = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(x, x0b)
    x1, _ = next(iter(loader.epoch(1)))
    assert not np.array_equal(x, x1)
    with pytest.raises(ValueError):
        Loader(ds, 2, crop_hw=(999, 8))


def test_prefetch_to_device(packs):
    import jax
    from pcss_unet_tpu.data import prefetch_to_device

    ds = PackedDataset(packs, "train")
    loader = Loader(ds, batch_size=2)
    batches = list(prefetch_to_device(loader.epoch(0)))
    assert len(batches) == 4
    assert isinstance(batches[0][0], jax.Array)


def test_per_file_export(split_dir, tmp_path):
    """Per-pair .npz export with optional min-max normalization
    (the orphan preprocess.py capability, rebuilt)."""
    from pcss_unet_tpu.data.records import export_per_file

    out = str(tmp_path / "files")
    n = export_per_file(os.path.join(split_dir, "train"), out,
                        normalize="minmax")
    assert n == 9
    files = sorted(f for f in os.listdir(out) if f.endswith(".npz"))
    assert len(files) == 9
    data = np.load(os.path.join(out, files[0]))
    assert data["input"].shape == (H, W, 4)
    assert data["label"].shape == (H, W, 1)
    # min-max normalized per channel
    assert data["input"].min() >= 0.0 and data["input"].max() <= 1.0 + 1e-6


def test_corrupt_file_skipped(split_dir, tmp_path):
    """Error-skip policy: one bad EXR doesn't kill the pack
    (prepare_dataset.py:59-61)."""
    import shutil
    src = os.path.join(split_dir, "train")
    bad_dir = str(tmp_path / "bad")
    shutil.copytree(src, bad_dir)
    with open(os.path.join(bad_dir, "zz_input.exr"), "wb") as f:
        f.write(b"not an exr file at all")
    with open(os.path.join(bad_dir, "zz_gt.png"), "wb") as f:
        f.write(b"nor a png")
    out = str(tmp_path / "packed")
    meta = build_packs(bad_dir, out, "train")
    assert meta["count"] == 9  # bad pair skipped, file truncated to fit
    x = np.load(os.path.join(out, "train_inputs.npy"), mmap_mode="r")
    assert x.shape[0] == 9
