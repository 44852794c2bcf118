"""StableHLO deployment export: serialize → deserialize → bit-identical
inference without the model code path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pcss_unet_tpu.infer import InferenceEngine
from pcss_unet_tpu.infer.export import export_inference, load_exported, save_exported
from pcss_unet_tpu.models import UNet


@pytest.fixture(scope="module")
def engine():
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32, dropout_rate=0.0)
    key = jax.random.PRNGKey(0)
    v = model.init({"params": key, "dropout": key},
                   jnp.zeros((1, 32, 32, 4)), True)
    means = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    stds = np.ones(4, np.float32)
    return InferenceEngine(model, dict(v), means=means, stds=stds,
                           dtype=jnp.float32)


def test_export_roundtrip(engine, rng, tmp_path):
    blob = export_inference(engine, 32, 48, batch=1, platforms=("cpu",))
    assert len(blob) > 1000
    fn = load_exported(blob)
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 4)).astype(np.float32))
    got = np.asarray(fn(x))
    ref = np.asarray(engine.run_padded(x))
    # recompilation may reorder fusions: bit-equality is not guaranteed,
    # fp32 closeness is
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    # file round-trip
    path = str(tmp_path / "model.stablehlo")
    n = save_exported(engine, path, 32, 48, platforms=("cpu",))
    assert n == len(open(path, "rb").read())
    fn2 = load_exported(open(path, "rb").read())
    np.testing.assert_allclose(np.asarray(fn2(x)), got, rtol=1e-7, atol=1e-7)


def test_export_rejects_unaligned(engine):
    with pytest.raises(ValueError, match="aligned"):
        export_inference(engine, 30, 48, platforms=("cpu",))
