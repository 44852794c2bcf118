"""End-to-end import of a checkpoint TRAINED by the reference's torch
semantics (scripts/make_torch_trained_golden.py).

tests/golden/torch_trained_w8.pth was produced by a faithful torch re-run
of the reference training pipeline (main.py:132-581: AdamW 7e-4/1e-3,
warmup+cosine LambdaLR, dynamic grad clip, shuffle=False batches, the
gradient-equivalent alpha*L1 loss, and the exact best-checkpoint dict of
main.py:539-544).  These tests assert the migration story the framework
promises a reference user: your trained ``.pth`` loads here unchanged and
scores the same predictions.
"""

import json
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from pcss_unet_tpu.infer import InferenceEngine, load_variables
from pcss_unet_tpu.models import UNet

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "golden", "torch_trained_w8.pth")
META = os.path.join(HERE, "golden", "torch_trained_w8.json")


def _make_frames(seed, n, hw):
    sys.path.insert(0, os.path.join(os.path.dirname(HERE), "scripts"))
    from make_synthetic_scene import render_frame

    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for _ in range(n):
        gbuf, soft = render_frame(rng, hw, hw)
        xs.append(gbuf)
        ys.append(soft)
    return np.stack(xs), np.stack(ys)


def _engine(meta):
    model = UNet(encoder_widths=tuple(meta["widths"]), dtype=jnp.float32,
                 dropout_rate=0.0)
    variables = load_variables(FIXTURE)
    return InferenceEngine(
        model, variables, means=np.asarray(meta["means"], np.float32),
        stds=np.asarray(meta["stds"], np.float32), dtype=jnp.float32)


def test_torch_trained_checkpoint_quality():
    """The imported torch-trained net reaches its committed label PSNR
    through this framework's inference path."""
    meta = json.load(open(META))
    xv, yv = _make_frames(meta["seed_val"], meta["n_val"], meta["hw"])
    engine = _engine(meta)
    psnrs = []
    for x, y in zip(xv, yv):
        pred = np.asarray(engine(x))[..., 0]
        mse = float(np.mean((pred - y) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    got = float(np.mean(psnrs))
    want = meta["val_psnr_db"]
    assert got > want - 1.0, (
        f"imported torch-trained quality regressed: {got:.2f} dB vs the "
        f"committed {want:.2f} dB")


def test_torch_trained_checkpoint_prediction_parity():
    """jax predictions from the imported ``.pth`` match the torch model's
    own eval predictions at >50 dB (the reference's own consistency-pass
    threshold, validate_consistency.py:186-191)."""
    torch = pytest.importorskip("torch")
    from pcss_unet_tpu.parity.unet_torch import make_torch_reference

    meta = json.load(open(META))
    xv, _ = _make_frames(meta["seed_val"], meta["n_val"], meta["hw"])
    engine = _engine(meta)

    tm = make_torch_reference(widths=tuple(meta["widths"]), dropout=0.0)
    ckpt = torch.load(FIXTURE, map_location="cpu", weights_only=True)
    tm.load_state_dict(ckpt["model_state_dict"], strict=True)
    tm.eval()
    means = np.asarray(meta["means"], np.float32)
    stds = np.asarray(meta["stds"], np.float32)
    x_t = torch.from_numpy(
        ((xv - means) / stds).transpose(0, 3, 1, 2).copy()).float()
    with torch.no_grad():
        torch_pred = tm(x_t).numpy()[:, 0]

    for i, x in enumerate(xv):
        jax_pred = np.asarray(engine(x))[..., 0]
        mse = float(np.mean((jax_pred - torch_pred[i]) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 50.0, f"frame {i}: torch-vs-jax parity {psnr:.1f} dB"


def test_torch_trained_checkpoint_dict_shape():
    """The fixture is the reference's exact best-checkpoint dict
    (main.py:539-544), so anything consuming reference checkpoints can
    use it as ground truth."""
    torch = pytest.importorskip("torch")
    ckpt = torch.load(FIXTURE, map_location="cpu", weights_only=True)
    assert set(ckpt) == {"epoch", "model_state_dict",
                         "optimizer_state_dict", "loss"}
    assert any(k.startswith("conv2.conv.") for k in ckpt["model_state_dict"])
