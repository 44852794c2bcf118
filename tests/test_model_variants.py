"""Model-family variants: the paper's 3/5/7-level depth study
(paper.md:179-203, Table 1), wide variants, and multi-light input stacks at
2K (BASELINE.json configs 4-5).  The reference hardcodes one net
(Unetmodel.py:36-63); these pin the generalized family."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.models import UNet, unet_from_config


@pytest.mark.parametrize("depth", [3, 4, 5, 7])
def test_depth_variants_forward(depth, rng):
    cfg = Config(model_depth=depth, base_width=8, compute_dtype="float32")
    model = unet_from_config(cfg)
    assert len(model.encoder_widths) == depth
    hw = 2 ** (depth + 1)  # minimum size: /2 unshuffle + (depth-1) pools
    x = jnp.asarray(rng.standard_normal((1, hw, hw, 4)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, True)
    out = model.apply(variables, x, False)
    assert out.shape == (1, hw, hw, 1)
    assert 0 <= float(out.min()) and float(out.max()) <= 1


def test_receptive_field_grows_with_depth(rng):
    """Deeper nets must react to farther pixels (the paper's penumbra-size
    argument: receptive fields 24/96/384 px for 3/5/7 levels)."""
    def edge_influence(depth):
        cfg = Config(model_depth=depth, base_width=8,
                     compute_dtype="float32", dropout_rate=0.0)
        model = unet_from_config(cfg)
        key = jax.random.PRNGKey(0)
        size = 256
        x = jnp.zeros((1, size, size, 4))
        variables = model.init({"params": key, "dropout": key}, x, True)
        base = model.apply(variables, x, False)
        poked = x.at[0, size // 2, size // 2, :].set(100.0)
        out = model.apply(variables, poked, False)
        diff = np.abs(np.asarray(out - base))[0, size // 2]
        nz = np.nonzero(diff[:, 0] > 1e-7)[0]
        return (nz.max() - nz.min()) if len(nz) else 0

    spread3 = edge_influence(3)
    spread5 = edge_influence(5)
    assert spread5 > spread3, (spread3, spread5)


def test_multilight_input_stack(rng):
    """Multi-light shadow-map stacks: 8 input channels at 2K
    (BASELINE.json config 5)."""
    model = UNet(in_ch=8, out_ch=1, encoder_widths=(8, 16),
                 dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 64, 128, 8)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, True)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 64, 128, 1)


def test_multi_output_channels(rng):
    model = UNet(in_ch=4, out_ch=3, encoder_widths=(8, 16),
                 dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, True)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 32, 32, 3)


def test_wide_variant_param_scaling():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 4))

    def n_params(width):
        cfg = Config(model_depth=4, base_width=width,
                     compute_dtype="float32")
        m = unet_from_config(cfg)
        v = m.init({"params": key, "dropout": key}, x, True)
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))

    assert n_params(16) > 3 * n_params(8)


@pytest.mark.parametrize("norm", ["batch_norm", "instance_norm",
                                  "group_norm", "none"])
def test_normalization_variants(norm, rng):
    model = UNet(encoder_widths=(16, 32), normalization=norm,
                 dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, True)
    if norm == "batch_norm":
        out, _ = model.apply(variables, x, True, rngs={"dropout": key},
                             mutable=["batch_stats"])
    else:
        out = model.apply(variables, x, True, rngs={"dropout": key})
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("act", ["leaky_relu", "relu", "gelu"])
def test_activation_variants(act, rng):
    model = UNet(encoder_widths=(8, 16), activation=act, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, True)
    out = model.apply(variables, x, False)
    assert np.isfinite(np.asarray(out)).all()


def test_fold_head_resize_equivalent(rng):
    """fold_head_resize=True (one contraction) ≡ False (literal up-then-down
    pair, Unetmodel.py:140-141) — exact linear-map composition."""
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 4)).astype(np.float32))
    m_fold = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                  dropout_rate=0.0, fold_head_resize=True)
    m_lit = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                 dropout_rate=0.0, fold_head_resize=False)
    v = m_fold.init({"params": key, "dropout": key}, x, True)
    out_f = m_fold.apply(v, x, False)
    out_l = m_lit.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_l),
                               rtol=1e-5, atol=1e-6)


def test_dilation_actually_applied(rng):
    """apply_dilation=True must change the computation (the reference's
    dilation arg is accepted-but-dead, Unetmodel.py:18-26)."""
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 4)).astype(np.float32))
    m_off = UNet(encoder_widths=(8, 16, 32), dtype=jnp.float32,
                 apply_dilation=False, dropout_rate=0.0)
    m_on = UNet(encoder_widths=(8, 16, 32), dtype=jnp.float32,
                apply_dilation=True, dropout_rate=0.0)
    v = m_off.init({"params": key, "dropout": key}, x, True)
    out_off = m_off.apply(v, x, False)
    out_on = m_on.apply(v, x, False)  # same params: kernels shapes match
    assert float(jnp.abs(out_on - out_off).max()) > 1e-6
