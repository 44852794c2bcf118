"""BatchNorm folding for deployment.

At inference BatchNorm is an affine map with frozen running statistics
(use_running_average, the reference's eval mode), so it folds exactly into
the preceding convolution:

    y = γ · (conv(x, W) + b − μ) / √(σ² + ε) + β
      = conv(x, W · s) + ((b − μ) · s + β),   s = γ / √(σ² + ε)

This is the paper's deployment posture (trimmed/quantized nets,
paper.md:143) applied TPU-side: the folded network touches no batch_stats
buffers and runs two fewer elementwise passes per ConvBlock.  Folding is
exact in fp32; InferenceEngine applies it via ``fold_bn=True``.

Only valid for ``normalization='batch_norm'`` models; the folded variables
target the same architecture constructed with ``normalization='none'``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # matches ConvBlock/torch BatchNorm2d (Unetmodel.py:22)


def _fold_pair(conv: dict, norm: dict, stats: dict) -> dict:
    scale = np.asarray(norm["scale"], np.float64)
    bias = np.asarray(norm["bias"], np.float64)
    mean = np.asarray(stats["mean"], np.float64)
    var = np.asarray(stats["var"], np.float64)
    s = scale / np.sqrt(var + BN_EPS)
    kernel = np.asarray(conv["kernel"], np.float64) * s  # broadcast over O
    b = (np.asarray(conv["bias"], np.float64) - mean) * s + bias
    return {"kernel": jnp.asarray(kernel, np.float32),
            "bias": jnp.asarray(b, np.float32)}


def fold_batchnorm(variables: dict) -> dict:
    """{'params', 'batch_stats'} of a batch_norm model → {'params',
    'batch_stats': {}} for the same model with normalization='none'."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    folded: dict = {}
    for block_name, block in params.items():
        if "conv_a" in block:  # a ConvBlock
            folded[block_name] = {
                "conv_a": _fold_pair(block["conv_a"], block["norm_a"],
                                     stats[block_name]["norm_a"]),
                "conv_b": _fold_pair(block["conv_b"], block["norm_b"],
                                     stats[block_name]["norm_b"]),
            }
        else:  # plain conv (the head)
            folded[block_name] = {
                "kernel": jnp.asarray(block["kernel"]),
                "bias": jnp.asarray(block["bias"]),
            }
    return {"params": folded, "batch_stats": {}}
