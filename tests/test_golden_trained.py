"""Trained-weight golden fixture (VERDICT r2 weak #6).

tests/golden/trained_w8.npz holds a toy-scale net trained by
scripts/make_golden_trained.py on a deterministic synthetic scene, stored
in the *reference's* state-dict naming (converter inside the frozen
surface).  These tests regenerate the same validation frames and assert
the committed weights still reach the committed label-PSNR — pinning
learned behavior through the full inference path, which the random-weight
golden test (test_golden.py) cannot do.
"""

import json
import os
import sys

import numpy as np
import jax.numpy as jnp

from pcss_unet_tpu.infer import InferenceEngine, load_variables
from pcss_unet_tpu.models import UNet

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "golden", "trained_w8.npz")
META = os.path.join(HERE, "golden", "trained_w8.json")


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


def test_trained_fixture_quality_pinned():
    meta = json.load(open(META))
    xv, yv = _make_frames(meta["seed_val"], meta["n_val"], meta["hw"])
    model = UNet(encoder_widths=tuple(meta["widths"]), dtype=jnp.float32,
                 dropout_rate=0.0)
    variables = load_variables(FIXTURE)
    engine = InferenceEngine(
        model, variables, means=np.asarray(meta["means"], np.float32),
        stds=np.asarray(meta["stds"], np.float32), dtype=jnp.float32)
    psnrs = []
    for x, y in zip(xv, yv):
        pred = np.asarray(engine(x))[..., 0]
        mse = float(np.mean((pred - y) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    got = float(np.mean(psnrs))
    want = meta["val_psnr_db"]
    assert got > want - 1.0, (
        f"trained-fixture quality regressed: {got:.2f} dB vs the committed "
        f"{want:.2f} dB — an op/converter/engine change shifted learned "
        "behavior")


def test_trained_fixture_beats_trivial_predictors():
    """The committed net must beat constant predictors by a clear margin —
    guards against the fixture itself being degenerate."""
    meta = json.load(open(META))
    _, yv = _make_frames(meta["seed_val"], meta["n_val"], meta["hw"])
    mean_mse = float(np.mean((yv.mean() - yv) ** 2))
    trivial = 10 * np.log10(1.0 / max(mean_mse, 1e-12))
    assert meta["val_psnr_db"] > trivial + 3.0, (
        meta["val_psnr_db"], trivial)
