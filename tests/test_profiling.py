"""Profiling utilities: per-layer latency report structure and XLA cost
analysis (the paper's per-layer timing analysis, paper.md:139-147)."""

import jax
import jax.numpy as jnp

from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.utils.profiling import compiled_flops, layer_latency_report


def test_layer_latency_report_structure():
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32, dropout_rate=0.0)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 32, 32, 4)), True)
    report = layer_latency_report(model, dict(variables),
                                  input_shape=(1, 32, 32, 4))
    stages = [r["stage"] for r in report]
    assert stages[0] == "enc_0" and stages[-1] == "full_model"
    assert "dec_final" in stages
    assert all(r["seconds"] > 0 for r in report)


def test_compiled_flops_counts():
    def f(a, b):
        return a @ b

    x = jnp.ones((64, 64))
    flops = compiled_flops(f, x, x)
    if flops is not None:  # backend-optional
        assert flops >= 2 * 64 ** 3 * 0.5
