"""Deployment-net golden fixture (VERDICT r3 next-#5).

tests/golden/deploy_w16.npz holds the trimmed w16 student distilled from a
full-size w64 teacher on the hard --variety scene by
scripts/make_deployment_golden.py.  These tests regenerate the same
deterministic validation frames and animated sequence and assert the
committed weights still reach the committed quality through the FULL
deployment chain — load from the reference-named export, fold BN, fused +
int8 kernels (interpreted on CPU) — so a regression anywhere in
train→distill→export→fold→fuse→int8 fails the suite.
"""

import json
import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FIXTURE = os.path.join(HERE, "golden", "deploy_w16.npz")
META = os.path.join(HERE, "golden", "deploy_w16.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="deployment golden fixture not yet generated "
           "(scripts/make_deployment_golden.py)")


@pytest.fixture(scope="module")
def meta():
    with open(META) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def fixture_engine(meta):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_deployment_golden import deployment_engine

    from pcss_unet_tpu.infer import load_variables

    variables = load_variables(FIXTURE)
    return deployment_engine(variables, np.asarray(meta["means"], np.float32),
                             np.asarray(meta["stds"], np.float32),
                             interpret=True)


def test_deployment_psnr_pinned(meta, fixture_engine):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_deployment_golden import make_frames

    xv, yv = make_frames(meta["seed_val"], meta["n_val"])
    psnrs = []
    for x, y in zip(xv, yv):
        pred = np.asarray(fixture_engine(x))[..., 0]
        mse = float(np.mean((pred - y[..., 0]) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    psnr = float(np.mean(psnrs))
    # 0.5 dB slack: bf16/int8 kernel noise across backends, nothing more
    assert psnr >= meta["val_psnr_db"] - 0.5, (
        f"deployment posture quality regressed: {psnr:.2f} dB vs committed "
        f"{meta['val_psnr_db']:.2f} dB")


def test_deployment_temporal_stability_pinned(meta, fixture_engine):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import jax.numpy as jnp

    from make_deployment_golden import make_sequence

    from pcss_unet_tpu.losses.temporal import measure_temporal_instability

    seq, motion = make_sequence(meta["seed_seq"], meta["n_seq"])
    preds = np.stack([np.asarray(fixture_engine(f)) for f in seq])
    if preds.ndim == 4:
        preds = preds[:, None]
    inst = float(measure_temporal_instability(
        jnp.asarray(preds), jnp.asarray(motion[:, None])))
    # regression gate: meaningfully MORE flicker than committed fails
    assert inst <= meta["temporal_instability"] * 1.25 + 1e-4, (
        f"deployment temporal instability regressed: {inst:.5f} vs "
        f"committed {meta['temporal_instability']:.5f}")
