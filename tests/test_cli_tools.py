"""CLI tools: temporal-sequence evaluation and model inspection."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pcss_unet_tpu.cli import inspect as cli_inspect
from pcss_unet_tpu.cli import temporal as cli_temporal
from pcss_unet_tpu.io.exr import write_exr
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.models.torch_import import export_to_torch_state_dict


@pytest.fixture(scope="module")
def npz_weights(tmp_path_factory):
    """Random-init reference-format .npz weights (full-size default net,
    which is what load_variables + the default config expect)."""
    root = tmp_path_factory.mktemp("w")
    model = UNet(dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    v = model.init({"params": key, "dropout": key},
                   jnp.zeros((1, 32, 32, 4)), True)
    flat = export_to_torch_state_dict(
        {"params": v["params"], "batch_stats": v["batch_stats"]})
    path = str(root / "weights.npz")
    np.savez(path, **{k: np.asarray(a) for k, a in flat.items()})
    return path


def test_temporal_cli(tmp_path, npz_weights, capsys):
    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    base = {n: rng.standard_normal((32, 32)).astype(np.float32) for n in "RGBA"}
    for t in range(3):
        drifted = {n: v + 0.05 * t for n, v in base.items()}
        write_exr(str(frames / f"t{t:03d}.exr"), drifted)
    cli_temporal.main(["--frames_dir", str(frames),
                       "--weights", npz_weights,
                       "--save_masks_dir", str(tmp_path / "masks")])
    out = capsys.readouterr().out
    assert "temporal instability" in out
    assert len(os.listdir(tmp_path / "masks")) == 3


def test_animated_sequence_motion_vectors(tmp_path, npz_weights, capsys):
    """The synthetic animated sequence + its ground-truth motion vectors
    (scripts/make_synthetic_scene.py --animate): warping with the exact
    motion must LOWER the measured instability of the ground-truth masks
    (the reference's stubbed motion branch, pert_loss.py:187-190, done for
    real), and cli.temporal consumes the same artifacts end to end."""
    import subprocess
    import sys

    import jax.numpy as jnp2

    from pcss_unet_tpu.losses import measure_temporal_instability

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "scripts/make_synthetic_scene.py"),
         "--out", str(tmp_path / "scene"), "--frames", "6",
         "--height", "48", "--width", "64", "--animate"],
        check=True, cwd=repo)
    seq_dir = tmp_path / "scene" / "sequence"
    gt_dir = tmp_path / "scene" / "sequence_gt"
    mv_path = tmp_path / "scene" / "motion.npy"
    assert len(os.listdir(seq_dir)) == 6
    mv = np.load(mv_path)
    assert mv.shape == (5, 48, 64, 2)
    assert np.abs(mv).max() > 0  # discs actually move

    from PIL import Image

    gt = np.stack([np.asarray(Image.open(gt_dir / f), np.float32) / 255.0
                   for f in sorted(os.listdir(gt_dir))])[:, None, :, :, None]
    raw = float(measure_temporal_instability(jnp2.asarray(gt), None,
                                             alpha=3.0))
    warped = float(measure_temporal_instability(
        jnp2.asarray(gt), jnp2.asarray(mv)[:, None], alpha=3.0))
    assert warped < raw, (warped, raw)

    cli_temporal.main(["--frames_dir", str(seq_dir),
                       "--weights", npz_weights,
                       "--motion_vectors", str(mv_path)])
    assert "temporal instability" in capsys.readouterr().out


def test_inspect_cli(tmp_path, capsys):
    ini = tmp_path / "c.ini"
    ini.write_text("[base]\nmodel_depth=3\nbase_width=8\n"
                   "image_width=64\nimage_height=64\n")
    cli_inspect.main(["--config", str(ini),
                      "--dot", str(tmp_path / "g.dot"), "--memory"])
    out = capsys.readouterr().out
    assert "parameters:" in out
    assert "HBM" in out
    dot = (tmp_path / "g.dot").read_text()
    assert dot.startswith("digraph")
