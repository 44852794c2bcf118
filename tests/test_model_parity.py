"""Full-model numerical parity vs a torch implementation of the reference
architecture (Unetmodel.py), plus checkpoint-conversion round-trips.

The torch model here is built *programmatically* from the documented
architecture (SURVEY.md §2 "U-Net model" row) purely as test ground truth —
the framework itself never touches torch for compute.

This plays the role of the reference's validate_consistency.py harness
(MSE<1e-6 / PSNR>50 verdict, validate_consistency.py:186-191) but across
frameworks instead of across code paths."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.models.torch_import import (
    convert_torch_state_dict,
    export_to_torch_state_dict,
)
from pcss_unet_tpu.parity.unet_torch import make_torch_reference


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = make_torch_reference()
    # make BN running stats non-trivial so eval parity actually tests them
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


@pytest.fixture(scope="module")
def flax_variables(torch_model):
    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return convert_torch_state_dict(state)


def test_param_count_matches(torch_model, flax_variables):
    n_torch = sum(p.numel() for p in torch_model.parameters())
    n_flax = sum(int(np.prod(p.shape))
                 for p in jax.tree.leaves(flax_variables["params"]))
    assert n_torch == n_flax


@pytest.mark.parametrize("hw", [(64, 64), (48, 80)])
def test_eval_forward_parity(torch_model, flax_variables, rng, hw):
    x = rng.standard_normal((2, *hw, 4)).astype(np.float32)
    with torch.inference_mode():
        ref = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    model = UNet(dtype=jnp.float32)
    ours = np.asarray(model.apply(
        {"params": flax_variables["params"],
         "batch_stats": flax_variables["batch_stats"]},
        jnp.asarray(x), False))
    ref_nhwc = np.transpose(ref, (0, 2, 3, 1))
    mse = float(np.mean((ours - ref_nhwc) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 50, f"PSNR {psnr:.1f} dB below parity threshold (mse={mse:.2e})"


def test_odd_size_fixup_parity(torch_model, flax_variables, rng):
    """Odd inputs: reference resizes to even dims before the net
    (Unetmodel.py:93-97)."""
    x = rng.standard_normal((1, 33, 49, 4)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.inference_mode():
        xt = F.interpolate(xt, (32, 48), mode="bilinear", align_corners=True)
        ref = torch_model(xt).numpy()
    model = UNet(dtype=jnp.float32)
    ours = np.asarray(model.apply(
        {"params": flax_variables["params"],
         "batch_stats": flax_variables["batch_stats"]},
        jnp.asarray(x), False))
    ref_nhwc = np.transpose(ref, (0, 2, 3, 1))
    assert ours.shape == ref_nhwc.shape
    mse = float(np.mean((ours - ref_nhwc) ** 2))
    assert mse < 1e-9


def test_export_roundtrip(flax_variables):
    state2 = export_to_torch_state_dict(flax_variables)
    back = convert_torch_state_dict(state2)
    for key in ("params", "batch_stats"):
        a = jax.tree.leaves(flax_variables[key])
        b = jax.tree.leaves(back[key])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bf16_close_to_fp32(flax_variables, rng):
    """bf16 compute path stays visually faithful (the deploy dtype)."""
    x = rng.standard_normal((1, 64, 64, 4)).astype(np.float32)
    fp32 = np.asarray(UNet(dtype=jnp.float32).apply(
        {"params": flax_variables["params"],
         "batch_stats": flax_variables["batch_stats"]}, jnp.asarray(x), False))
    bf16 = np.asarray(UNet(dtype=jnp.bfloat16).apply(
        {"params": flax_variables["params"],
         "batch_stats": flax_variables["batch_stats"]}, jnp.asarray(x), False)
    ).astype(np.float32)
    mse = float(np.mean((fp32 - bf16) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 30, f"bf16 PSNR {psnr:.1f} dB"
