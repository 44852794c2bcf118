"""Convert reference PyTorch checkpoints into Flax variables.

The reference saves ``{'epoch', 'model_state_dict', 'optimizer_state_dict',
'loss'}`` dicts (main.py:539-544) or raw state dicts (both accepted by its
own loaders, infer.py:36-41).  Its parameter names follow ``Unetmodel.py``'s
module layout:

    conv2..conv5   encoder DoubleConv blocks     → enc_0..enc_3
    conv6..conv8   decoder DoubleConv blocks     → dec_0..dec_2
    conv9          final half-dropout block      → dec_final
    conv10         1×1 output conv               → head

and inside each DoubleConv (Unetmodel.py:20-30):

    .conv.0  3×3 Conv2d   → conv_a      (OIHW → HWIO)
    .conv.1  BatchNorm2d  → norm_a      (weight→scale, running stats→batch_stats)
    .conv.4  1×1 Conv2d   → conv_b
    .conv.5  BatchNorm2d  → norm_b

This module is pure numpy — torch is only needed by the caller to unpickle
``.pth`` files (``load_torch_checkpoint``).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

# torch module name → our flax module name (default depth-4 network)
REFERENCE_BLOCK_MAP = {
    "conv2": "enc_0",
    "conv3": "enc_1",
    "conv4": "enc_2",
    "conv5": "enc_3",
    "conv6": "dec_0",
    "conv7": "dec_1",
    "conv8": "dec_2",
    "conv9": "dec_final",
}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW (torch Conv2d) → HWIO (flax Conv)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_torch_state_dict(state: Mapping[str, np.ndarray]) -> dict:
    """Reference state dict (numpy values) → {'params', 'batch_stats'}."""
    params: dict = {}
    batch_stats: dict = {}
    for tname, fname in REFERENCE_BLOCK_MAP.items():
        block_p: dict = {}
        block_s: dict = {}
        for torch_idx, our in (("0", "a"), ("4", "b")):
            block_p[f"conv_{our}"] = {
                "kernel": _conv_kernel(np.asarray(state[f"{tname}.conv.{torch_idx}.weight"])),
                "bias": np.asarray(state[f"{tname}.conv.{torch_idx}.bias"]),
            }
        for torch_idx, our in (("1", "a"), ("5", "b")):
            block_p[f"norm_{our}"] = {
                "scale": np.asarray(state[f"{tname}.conv.{torch_idx}.weight"]),
                "bias": np.asarray(state[f"{tname}.conv.{torch_idx}.bias"]),
            }
            block_s[f"norm_{our}"] = {
                "mean": np.asarray(state[f"{tname}.conv.{torch_idx}.running_mean"]),
                "var": np.asarray(state[f"{tname}.conv.{torch_idx}.running_var"]),
            }
        params[fname] = block_p
        batch_stats[fname] = block_s
    params["head"] = {
        "kernel": _conv_kernel(np.asarray(state["conv10.weight"])),
        "bias": np.asarray(state["conv10.bias"]),
    }
    return {"params": params, "batch_stats": batch_stats}


def export_to_torch_state_dict(variables: Mapping) -> dict:
    """Inverse conversion: Flax variables → reference-named numpy state dict
    (lets reference tooling consume checkpoints trained here)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: dict[str, np.ndarray] = {}
    for tname, fname in REFERENCE_BLOCK_MAP.items():
        bp, bs = params[fname], stats.get(fname, {})
        for torch_idx, our in (("0", "a"), ("4", "b")):
            k = np.asarray(bp[f"conv_{our}"]["kernel"])
            out[f"{tname}.conv.{torch_idx}.weight"] = np.ascontiguousarray(
                np.transpose(k, (3, 2, 0, 1)))
            out[f"{tname}.conv.{torch_idx}.bias"] = np.asarray(bp[f"conv_{our}"]["bias"])
        for torch_idx, our in (("1", "a"), ("5", "b")):
            out[f"{tname}.conv.{torch_idx}.weight"] = np.asarray(bp[f"norm_{our}"]["scale"])
            out[f"{tname}.conv.{torch_idx}.bias"] = np.asarray(bp[f"norm_{our}"]["bias"])
            ns = bs.get(f"norm_{our}", {})
            out[f"{tname}.conv.{torch_idx}.running_mean"] = np.asarray(
                ns.get("mean", np.zeros_like(bp[f"norm_{our}"]["scale"])))
            out[f"{tname}.conv.{torch_idx}.running_var"] = np.asarray(
                ns.get("var", np.ones_like(bp[f"norm_{our}"]["scale"])))
            out[f"{tname}.conv.{torch_idx}.num_batches_tracked"] = np.asarray(0)
    hk = np.asarray(params["head"]["kernel"])
    out["conv10.weight"] = np.ascontiguousarray(np.transpose(hk, (3, 2, 0, 1)))
    out["conv10.bias"] = np.asarray(params["head"]["bias"])
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference ``.pth`` (dict-with-model_state_dict or raw state
    dict — both formats, matching infer.py:36-41) and convert to Flax
    variables.  Requires torch at call time only."""
    import torch  # local import: torch is a conversion-time-only dependency

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    np_state = {k: v.detach().cpu().numpy() for k, v in state.items()
                if hasattr(v, "detach")}
    return convert_torch_state_dict(np_state)
