"""Streaming serving pipeline: ordering, correctness vs the plain engine,
bad-file skip policy, and the serve CLI."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pcss_unet_tpu.infer import InferenceEngine
from pcss_unet_tpu.infer.server import ShadowServer
from pcss_unet_tpu.io.exr import write_exr
from pcss_unet_tpu.models import UNet


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    for i in range(7):
        chans = {n: rng.standard_normal((24, 40)).astype(np.float32)
                 for n in "RGBA"}
        write_exr(str(root / f"f{i:03d}.exr"), chans)
    with open(root / "f099.exr", "wb") as f:
        f.write(b"garbage")
    return str(root)


@pytest.fixture(scope="module")
def engine():
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32, dropout_rate=0.0)
    key = jax.random.PRNGKey(0)
    v = model.init({"params": key, "dropout": key},
                   jnp.zeros((1, 32, 32, 4)), True)
    return InferenceEngine(model, dict(v), dtype=jnp.float32)


def test_server_matches_engine(frames_dir, engine):
    from pcss_unet_tpu.io.exr import read_exr_stack

    paths = sorted(os.path.join(frames_dir, f)
                   for f in os.listdir(frames_dir) if f != "f099.exr")
    server = ShadowServer(engine, batch_size=2, decode_workers=3)
    got: dict[str, np.ndarray] = {}
    stats = server.run(paths, lambda p, m: got.__setitem__(p, m))
    assert stats.frames == 7
    assert stats.fps > 0
    assert set(got) == set(paths)
    # latency plumbing: one decode-start→sink latency per served frame,
    # percentiles ordered and bounded by the run wall time
    assert len(stats.latencies) == 7
    assert 0 < stats.p50_ms <= stats.p99_ms <= stats.wall_seconds * 1e3
    assert stats.latency_ms(0) <= stats.p50_ms
    assert stats.sync_seconds >= 0
    for p in paths:
        ref = engine(read_exr_stack(p))
        ref_u8 = np.round(np.clip(ref, 0, 1) * 255).astype(np.uint8)
        assert got[p].shape == ref_u8.shape
        np.testing.assert_array_equal(got[p], ref_u8)


def test_server_skips_bad_files(frames_dir, engine):
    paths = sorted(os.path.join(frames_dir, f)
                   for f in os.listdir(frames_dir))  # includes the garbage
    server = ShadowServer(engine, batch_size=3)
    got = {}
    stats = server.run(paths, lambda p, m: got.__setitem__(p, m))
    assert stats.frames == 7  # garbage skipped, others served


def test_serve_cli(frames_dir, tmp_path):
    from pcss_unet_tpu.cli import serve as cli_serve
    from pcss_unet_tpu.models.torch_import import export_to_torch_state_dict

    model = UNet(dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    v = model.init({"params": key, "dropout": key},
                   jnp.zeros((1, 32, 32, 4)), True)
    flat = export_to_torch_state_dict(
        {"params": v["params"], "batch_stats": v["batch_stats"]})
    wpath = str(tmp_path / "w.npz")
    np.savez(wpath, **{k: np.asarray(a) for k, a in flat.items()})
    out_dir = str(tmp_path / "masks")
    cli_serve.main(["--frames_dir", frames_dir, "--out_dir", out_dir,
                    "--weights", wpath, "--batch", "2"])
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 7
