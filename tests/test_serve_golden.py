"""Served-posture quality pin (VERDICT r4 weak-#6).

The streaming server's latency behavior is measured on hardware
(docs/BENCHMARKS.md "Serving", logs/bench_r5e.jsonl); this module pins the
OTHER half on the same path: real EXR bytes through ShadowServer's decode →
batch → device → drain pipeline with the committed deployment-golden
student at the full deployment posture (fold-BN + fused + int8 kernels,
interpreted on CPU) must reproduce the fixture's committed label-PSNR.  A
regression anywhere in serve's decode/batch/pad/uint8-drain plumbing OR in
the deployment chain fails the suite with a quality number, not a shape
error.
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


def test_served_masks_reach_committed_quality(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_deployment_golden import deployment_engine, make_frames

    from pcss_unet_tpu.infer import load_variables
    from pcss_unet_tpu.infer.server import ShadowServer
    from pcss_unet_tpu.io.exr import write_exr

    with open(META) as f:
        meta = json.load(f)
    engine = deployment_engine(
        load_variables(FIXTURE), np.asarray(meta["means"], np.float32),
        np.asarray(meta["stds"], np.float32), interpret=True)

    xv, yv = make_frames(meta["seed_val"], meta["n_val"])
    paths = []
    for i, x in enumerate(xv):
        p = str(tmp_path / f"val{i:02d}.exr")
        write_exr(p, {"R": x[..., 0], "G": x[..., 1],
                      "B": x[..., 2], "A": x[..., 3]}, compression="ZIP")
        paths.append(p)

    masks = {}
    server = ShadowServer(engine, batch_size=2, decode_workers=2)
    stats = server.run(paths, lambda p, m: masks.__setitem__(p, m))

    assert stats.frames == len(paths)
    psnrs = []
    for p, y in zip(paths, yv):
        m = masks[p]
        assert m.dtype == np.uint8 and m.shape == y.shape
        mse = float(np.mean((m.astype(np.float32) / 255.0 - y[..., 0:1]) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    psnr = float(np.mean(psnrs))
    # 0.6 dB slack: the golden test's 0.5 dB cross-backend allowance plus
    # the uint8 mask quantization (invisible at this PSNR level)
    assert psnr >= meta["val_psnr_db"] - 0.6, (
        f"served deployment quality regressed: {psnr:.2f} dB vs committed "
        f"{meta['val_psnr_db']:.2f} dB")
