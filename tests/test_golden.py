"""Golden-value regression net.

Freezes the model's eval output for a deterministic synthetic checkpoint
(built from seeded numpy arrays in the *reference's* state-dict naming and
converted through torch_import — so the converter is inside the frozen
surface).  Any future change to the converters, ops, or model that shifts
numerics beyond fp tolerance trips this without needing torch at runtime.

Regenerate intentionally with:
    python tests/test_golden.py --regen
"""

import os

import numpy as np
import jax.numpy as jnp

from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.models.torch_import import convert_torch_state_dict

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "unet_eval.npz")

# reference DoubleConv channel plan (Unetmodel.py:39-63)
_BLOCKS = {"conv2": (16, 64), "conv3": (64, 128), "conv4": (128, 512),
           "conv5": (512, 1024), "conv6": (1024, 512), "conv7": (512, 128),
           "conv8": (128, 64), "conv9": (64, 16)}


def synthetic_reference_state(seed: int = 1234) -> dict:
    """Deterministic state dict with the reference's exact key layout."""
    rng = np.random.default_rng(seed)

    def conv(cin, cout, k):
        return (rng.standard_normal((cout, cin, k, k)).astype(np.float32)
                * (1.0 / np.sqrt(cin * k * k)))

    state = {}
    for name, (cin, cout) in _BLOCKS.items():
        state[f"{name}.conv.0.weight"] = conv(cin, cin, 3)
        state[f"{name}.conv.0.bias"] = rng.standard_normal(cin).astype(np.float32) * 0.01
        state[f"{name}.conv.1.weight"] = rng.uniform(0.8, 1.2, cin).astype(np.float32)
        state[f"{name}.conv.1.bias"] = rng.standard_normal(cin).astype(np.float32) * 0.01
        state[f"{name}.conv.1.running_mean"] = rng.standard_normal(cin).astype(np.float32) * 0.05
        state[f"{name}.conv.1.running_var"] = rng.uniform(0.8, 1.2, cin).astype(np.float32)
        state[f"{name}.conv.4.weight"] = conv(cin, cout, 1)
        state[f"{name}.conv.4.bias"] = rng.standard_normal(cout).astype(np.float32) * 0.01
        state[f"{name}.conv.5.weight"] = rng.uniform(0.8, 1.2, cout).astype(np.float32)
        state[f"{name}.conv.5.bias"] = rng.standard_normal(cout).astype(np.float32) * 0.01
        state[f"{name}.conv.5.running_mean"] = rng.standard_normal(cout).astype(np.float32) * 0.05
        state[f"{name}.conv.5.running_var"] = rng.uniform(0.8, 1.2, cout).astype(np.float32)
    state["conv10.weight"] = conv(16, 4, 1)
    state["conv10.bias"] = rng.standard_normal(4).astype(np.float32) * 0.01
    return state


def compute_golden_output():
    variables = convert_torch_state_dict(synthetic_reference_state())
    model = UNet(dtype=jnp.float32)
    x = np.asarray(np.random.default_rng(99)
                   .standard_normal((1, 32, 48, 4)), np.float32)
    out = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]},
                      jnp.asarray(x), False)
    return x, np.asarray(out)


def test_golden_eval_output():
    assert os.path.exists(GOLDEN), "golden file missing — run --regen"
    data = np.load(GOLDEN)
    x, out = compute_golden_output()
    np.testing.assert_array_equal(x, data["input"])
    np.testing.assert_allclose(out, data["output"], rtol=2e-5, atol=2e-6,
                               err_msg="model numerics drifted from golden")


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        x, out = compute_golden_output()
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, input=x, output=out)
        print(f"wrote {GOLDEN}: output mean {out.mean():.6f}")
