"""Config system: reference-schema INI loading, override precedence,
type coercion, unknown-key tolerance (config.ini:1-38 semantics via
main.py:875-885)."""

import pytest

from pcss_unet_tpu.config import Config, load_config, save_config

# the reference's exact config.ini content (schema fidelity check)
REFERENCE_INI = """
[base]
batch_size=8
num_epochs=200
learning_rate=0.0007
activation=leaky_relu
normalization=batch_norm
dropout_rate=0.2
optimizer_type=adamw
warmup_epochs=5
perturbation_count=3
perturb_weight=0.1
save_dir=./checkpoints
ckptpath=./checkpoints/pcss_model.pth
best_model_path=./checkpoints/pcss_best_model.pth
train_dir=./data/train
val_dir=./data/val
processed_data_dir = ./data/processed
image_width=2048
image_height=1024
input_channels=4
output_channels=1
alpha=0.9
loss_type=standard
validation_frequency=1
log_dir=./logs
save_frequency=10
"""


def test_defaults_match_reference():
    cfg = Config()
    assert cfg.batch_size == 8
    assert cfg.num_epochs == 200
    assert cfg.learning_rate == pytest.approx(7e-4)
    assert cfg.alpha == 0.9
    assert cfg.perturbation_count == 3
    assert cfg.image_width == 2048 and cfg.image_height == 1024


def test_reference_ini_loads(tmp_path):
    ini = tmp_path / "ref.ini"
    ini.write_text(REFERENCE_INI)
    cfg = load_config(str(ini))
    assert cfg.optimizer_type == "adamw"
    assert cfg.processed_data_dir == "./data/processed"  # spaced '=' form
    assert cfg.save_frequency == 10
    assert cfg.loss_type == "standard"


def test_cli_overrides_beat_ini(tmp_path):
    ini = tmp_path / "c.ini"
    ini.write_text("[base]\nbatch_size=8\nloss_type=standard\n")
    cfg = load_config(str(ini), {"loss_type": "perturb", "batch_size": 2,
                                 "perturb_weight": None})
    assert cfg.loss_type == "perturb" and cfg.batch_size == 2
    assert cfg.perturb_weight == 0.1  # None override ignored


def test_unknown_keys_ignored(tmp_path):
    ini = tmp_path / "c.ini"
    ini.write_text("[base]\nbatch_size=4\nsome_future_key=hello\n")
    cfg = load_config(str(ini))
    assert cfg.batch_size == 4


def test_bool_and_comment_coercion(tmp_path):
    ini = tmp_path / "c.ini"
    ini.write_text("[base]\nshuffle=false\nresume=1\n"
                   "batch_size=16  # inline comment\n")
    cfg = load_config(str(ini))
    assert cfg.shuffle is False and cfg.resume is True
    assert cfg.batch_size == 16


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        load_config("/nonexistent/config.ini")


def test_save_config_roundtrip(tmp_path):
    import json

    cfg = Config(batch_size=3, loss_type="perturb")
    path = str(tmp_path / "resolved.json")
    save_config(cfg, path)
    data = json.load(open(path))
    assert data["batch_size"] == 3 and data["loss_type"] == "perturb"


def test_new_training_keys_load_from_ini(tmp_path):
    """Round-3 keys (gradient accumulation, EMA) ride the same INI schema."""
    ini = tmp_path / "t.ini"
    ini.write_text("[base]\ngrad_accum_steps = 4\nema_decay = 0.999\n")
    cfg = load_config(str(ini))
    assert cfg.grad_accum_steps == 4
    assert cfg.ema_decay == pytest.approx(0.999)
