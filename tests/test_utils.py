"""Utils tests: memory governor, visualization dumps, NaN sanitizers,
logging, torch .pth export round-trip."""

import logging
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pcss_unet_tpu.utils.memory import (
    check_memory, estimate_memory_usage, find_optimal_batch_size, param_count,
)
from pcss_unet_tpu.utils.nan_debug import checked_sigmoid_range, find_nonfinite
from pcss_unet_tpu.utils.visualize import hlo_text, jaxpr_dot, jaxpr_text
from pcss_unet_tpu.utils.logging import ContentColoredFormatter, setup_logger
from pcss_unet_tpu.utils.prng import set_seed


def test_memory_estimator_scales():
    small = estimate_memory_usage(15_700_000, 1, 256, 256)
    big = estimate_memory_usage(15_700_000, 8, 1024, 2048)
    assert big["total"] > small["total"]
    # shape-aware factor: superlinear in pixels·batch (round-4 calibration
    # against XLA static plans, logs/bench_train_r4.jsonl)
    assert big["activations"] >= small["activations"] * 8 * 4 * 8
    # calibration pins (measured XLA plans on the chip): 1080p batch 1
    # fits 16G comfortably (plan 3.12 GiB)…
    assert check_memory(15_700_000, 1, 1088, 1920, hbm_bytes=16 << 30)
    # …batch 8 @ 1080p does NOT (plan ~8×2.73 GiB temp) — the flat-18×
    # model claimed it did; that claim OOM'd at 2K on real hardware
    assert not check_memory(15_700_000, 8, 1088, 1920, hbm_bytes=16 << 30)
    assert not check_memory(15_700_000, 4096, 1088, 1920,
                            hbm_bytes=16 << 30)


def test_find_optimal_batch_size_monotone():
    b16 = find_optimal_batch_size(15_700_000, 1088, 1920,
                                  hbm_bytes=16 << 30)
    b32 = find_optimal_batch_size(15_700_000, 1088, 1920,
                                  hbm_bytes=32 << 30)
    assert 1 <= b16 <= b32
    assert (b16 & (b16 - 1)) == 0  # power of two


def test_param_count():
    tree = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros(5)}}
    assert param_count(tree) == 17


def test_visualize_dumps():
    def f(x):
        return jnp.tanh(x) @ x.T

    x = jnp.ones((4, 8))
    assert "tanh" in jaxpr_text(f, x)
    dot = jaxpr_dot(f, x)
    assert dot.startswith("digraph") and "tanh" in dot
    hlo = hlo_text(f, x)
    assert "tanh" in hlo.lower() or "stablehlo" in hlo.lower()


def test_checked_sigmoid_range():
    checked = checked_sigmoid_range(lambda x: x)
    err, _ = checked(jnp.asarray([0.2, 0.8]))
    err.throw()  # no violation
    err, _ = checked(jnp.asarray([0.2, 1.8]))
    with pytest.raises(Exception, match="sigmoid"):
        err.throw()


def test_find_nonfinite():
    tree = {"good": jnp.ones(4),
            "bad": jnp.asarray([1.0, jnp.nan, jnp.inf, -jnp.inf])}
    report = find_nonfinite(tree)
    assert len(report) == 1
    (key, counts), = report.items()
    assert "bad" in key and counts == {"nan": 1, "inf": 2}


def test_colored_formatter_keys_on_content():
    fmt = ContentColoredFormatter("%(message)s", use_color=True)
    rec = logging.LogRecord("x", logging.INFO, "", 0,
                            "GPU memory usage: 5GB", (), None)
    assert "\x1b[36m" in fmt.format(rec)       # cyan for memory
    rec2 = logging.LogRecord("x", logging.INFO, "", 0,
                             "val loss: 0.5", (), None)
    assert "\x1b[35m" in fmt.format(rec2)      # magenta for val
    rec3 = logging.LogRecord("x", logging.ERROR, "", 0, "boom", (), None)
    assert "\x1b[31m" in fmt.format(rec3)      # red for errors


def test_setup_logger_writes_file(tmp_path):
    logger = setup_logger(str(tmp_path), name="t")
    logger.info("hello file")
    for h in logger.handlers:
        h.flush()
    files = os.listdir(tmp_path)
    assert any(f.startswith("train_") and f.endswith(".log") for f in files)


def test_set_seed_deterministic():
    k1 = set_seed(7)
    a = np.random.rand(3)
    k2 = set_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_torch_export_roundtrip(tmp_path):
    """Framework checkpoint → .pth → load_torch_checkpoint round-trip
    (the reference-consumable format, main.py:539-544)."""
    import torch

    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.models.torch_import import (
        export_to_torch_state_dict, load_torch_checkpoint)

    model = UNet(dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 32, 32, 4)), True)
    flat = export_to_torch_state_dict(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})
    pth = str(tmp_path / "ck.pth")
    torch.save({"epoch": 3, "model_state_dict":
                {k: torch.from_numpy(np.asarray(v).copy())
                 for k, v in flat.items()}, "loss": 0.1}, pth)
    back = load_torch_checkpoint(pth)
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(back["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
