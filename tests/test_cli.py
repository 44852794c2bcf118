"""CLI integration test: the complete reference workflow end to end —
organize → prepare → stats → train → infer → validate → check — on a tiny
synthetic scene (SURVEY.md §1's artifact-contract chain, exercised through
the same entry points the reference exposes)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pcss_unet_tpu.cli import check as cli_check
from pcss_unet_tpu.cli import infer as cli_infer
from pcss_unet_tpu.cli import organize as cli_organize
from pcss_unet_tpu.cli import prepare as cli_prepare
from pcss_unet_tpu.cli import stats as cli_stats
from pcss_unet_tpu.cli import train as cli_train
from pcss_unet_tpu.cli import validate as cli_validate
from pcss_unet_tpu.io.exr import write_exr


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliwork")
    scene = root / "scene"
    (scene / "conditioning_images").mkdir(parents=True)
    (scene / "images").mkdir()
    rng = np.random.default_rng(0)
    for i in range(10):
        chans = {n: rng.standard_normal((32, 32)).astype(np.float32)
                 for n in "RGBA"}
        write_exr(str(scene / "conditioning_images" / f"f{i:02d}.exr"), chans)
        Image.fromarray((rng.random((32, 32)) * 255).astype(np.uint8),
                        "L").save(scene / "images" / f"f{i:02d}.png")
    ini = root / "tiny.ini"
    ini.write_text(f"""[base]
batch_size=4
num_epochs=2
learning_rate=0.002
warmup_epochs=1
model_depth=3
base_width=8
compute_dtype=float32
save_dir={root}/ckpt
processed_data_dir={root}/processed
train_dir={root}/data/train
val_dir={root}/data/val
log_dir={root}/logs
validation_frequency=1
save_frequency=1
""")
    return root


def test_cli_full_chain(workdir, capsys):
    root = str(workdir)
    # organize
    cli_organize.main(["--scene_dir", f"{root}/scene",
                       "--out_dir", f"{root}/data", "--seed", "1"])
    assert os.path.isdir(f"{root}/data/train")
    # check channels
    with pytest.raises(SystemExit) as e:
        cli_check.main(["channels", f"{root}/data/train"])
    assert e.value.code == 0
    # prepare
    cli_prepare.main(["--config", f"{root}/tiny.ini"])
    assert os.path.exists(f"{root}/processed/train_inputs.npy")
    # stats
    cli_stats.main(["--dataset_path", f"{root}/processed"])
    assert os.path.exists(f"{root}/processed/train_stats.npy")
    # check pair + packs
    pair = [f for f in os.listdir(f"{root}/data/train")
            if f.endswith("_input.exr")][0]
    with pytest.raises(SystemExit) as e:
        cli_check.main(["pair", "--exr", f"{root}/data/train/{pair}",
                        "--png", f"{root}/data/train/"
                                 f"{pair.replace('_input.exr', '_gt.png')}",
                        "--figure", f"{root}/pair_channels.png"])
    assert e.value.code == 0
    assert os.path.exists(f"{root}/pair_channels.png")
    with pytest.raises(SystemExit) as e:
        cli_check.main(["packs", "--dataset_path", f"{root}/processed",
                        "--max_samples", "2",
                        "--report", f"{root}/pack_report.json"])
    assert e.value.code == 0
    assert json.load(open(f"{root}/pack_report.json"))
    # without the ImageNet VGG artifact a perceptual-blend loss must be an
    # explicit decision, not a buried warning (VERDICT r3 next-#7)
    with pytest.raises(SystemExit, match="allow_random_vgg"):
        cli_train.main(["--config", f"{root}/tiny.ini"])
    # train 2 epochs
    cli_train.main(["--config", f"{root}/tiny.ini", "--allow_random_vgg"])
    ckpts = os.listdir(f"{root}/ckpt")
    assert any(c.isdigit() for c in ckpts), ckpts
    best = sorted(int(c) for c in ckpts if c.isdigit())[-1]
    # infer
    cli_infer.main(["--input", f"{root}/data/train/{pair}",
                    "--output", f"{root}/mask.png",
                    "--weights", f"{root}/ckpt/{best}",
                    "--config", f"{root}/tiny.ini",
                    "--stats_dir", f"{root}/processed",
                    "--dtype", "float32"])
    assert os.path.exists(f"{root}/mask.png")
    mask = np.asarray(Image.open(f"{root}/mask.png"))
    assert mask.shape == (32, 32)
    # tiled inference path
    cli_infer.main(["--input", f"{root}/data/train/{pair}",
                    "--output", f"{root}/mask_tiled.png",
                    "--weights", f"{root}/ckpt/{best}",
                    "--config", f"{root}/tiny.ini", "--tile", "16",
                    "--halo", "4", "--dtype", "float32"])
    assert os.path.exists(f"{root}/mask_tiled.png")
    # deployment posture: folded BN + int8 serving mode through the CLI
    cli_infer.main(["--input", f"{root}/data/train/{pair}",
                    "--output", f"{root}/mask_deploy.png",
                    "--weights", f"{root}/ckpt/{best}",
                    "--config", f"{root}/tiny.ini",
                    "--stats_dir", f"{root}/processed",
                    "--dtype", "float32", "--fold_bn", "--quantize", "int8"])
    deploy = np.asarray(Image.open(f"{root}/mask_deploy.png"), np.float32)
    np.testing.assert_allclose(deploy / 255.0, mask / 255.0, atol=0.05)
    # consistency validation
    cli_validate.main(["--weights", f"{root}/ckpt/{best}",
                       "--input", f"{root}/data/train/{pair}",
                       "--output_dir", f"{root}/consistency",
                       "--config", f"{root}/tiny.ini",
                       "--stats_dir", f"{root}/processed", "--panel"])
    assert os.path.exists(f"{root}/consistency/panel.png")
    out = capsys.readouterr().out
    assert "verdict:" in out.lower()
    assert "FAIL" not in out.split("verdict:")[-1]


def test_check_split_channels(tmp_path, capsys):
    """`check split` mirrors reference test.py:38-86: every channel in the
    file becomes a min-max-normalized 8-bit grayscale PNG; constant channels
    map to zeros."""
    from PIL import Image

    from pcss_unet_tpu.io.exr import write_exr

    rng = np.random.default_rng(3)
    h, w = 9, 13
    chans = {"R": rng.random((h, w)).astype(np.float32) * 4 - 2,
             "const": np.full((h, w), 0.7, np.float32),
             "depth.Z": rng.random((h, w)).astype(np.float32)}
    path = str(tmp_path / "g.exr")
    write_exr(path, chans)
    with pytest.raises(SystemExit) as e:
        cli_check.main(["split", "--exr", path,
                        "--out_dir", str(tmp_path / "out")])
    assert e.value.code == 0
    r = np.asarray(Image.open(tmp_path / "out" / "R.png"))
    assert r.shape == (h, w) and r.min() == 0 and r.max() == 255
    const = np.asarray(Image.open(tmp_path / "out" / "const.png"))
    np.testing.assert_array_equal(const, 0)  # test.py:71-72 semantics
    assert (tmp_path / "out" / "depth_Z.png").exists()  # sanitized name


def test_infer_cli_checkpoint_overrides_config_architecture(tmp_path):
    """Loading a checkpoint whose net doesn't match the config's
    base_width/model_depth must rebuild the model from the checkpoint
    (widths_from_params) instead of dying in a Flax shape error — the
    reference's infer.py never asks the user for the architecture."""
    rng = np.random.default_rng(3)
    exr = tmp_path / "frame.exr"
    write_exr(str(exr), {n: rng.standard_normal((32, 32)).astype(np.float32)
                         for n in "RGBA"})
    pth = os.path.join(os.path.dirname(__file__), "golden",
                       "torch_trained_w8.pth")
    out = tmp_path / "mask.png"
    # NO --config: defaults say base_width=64 model_depth=4, the .pth is an
    # (8, 16, 32, 64) net
    cli_infer.main(["--input", str(exr), "--output", str(out),
                    "--weights", pth, "--dtype", "float32"])
    mask = np.asarray(Image.open(out))
    assert mask.shape == (32, 32)


def test_widths_from_params_roundtrip():
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.models import UNet, widths_from_params

    for ws in [(8, 16, 32), (8, 16, 32, 64),
               (16, 16, 32, 64, 128, 128, 256)]:
        m = UNet(encoder_widths=ws)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 128, 128, 4), jnp.float32), False)
        widths, in_ch, out_ch = widths_from_params(v["params"])
        assert widths == ws and (in_ch, out_ch) == (4, 1)
    with pytest.raises(ValueError):
        widths_from_params({"dense": {"kernel": np.zeros((3, 3))}})
