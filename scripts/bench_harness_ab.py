#!/usr/bin/env python
"""Harness-validity A/B: prove (or refute) that the carry-chained scan's
dependency injection point decides whether XLA hoists the network.

Four measurements of the SAME model+frame:
  tiny_leaf   — carry perturbs the smallest param leaf (head bias).  The
                network upstream of that add is loop-invariant → LICM bait.
  entry_leaf  — carry perturbs the FIRST conv kernel: the whole net is
                downstream, nothing frame-sized can hoist.
  x_chain     — carry perturbs the input frame (round-3 methodology): one
                extra elementwise pass per iteration, fully dependent.
  separate    — scan_len independent dispatches with block_until_ready
                (dispatch overhead included; ground-truth upper bound).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN = 16
REPS = 3


def chain_variant(apply_fn, params, batch_stats, x, mode: str):
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(params)
    sizes = [int(np.prod(l.shape)) for l in leaves]
    paths = jax.tree_util.tree_flatten_with_path(params)[0]
    if mode == "tiny_leaf":
        idx = min(range(len(leaves)), key=lambda i: sizes[i])
    else:  # entry_leaf: the enc_0 conv_a kernel
        idx = next(i for i, (p, _) in enumerate(paths)
                   if "enc_0" in str(p) and "conv_a" in str(p)
                   and "kernel" in str(p))

    @jax.jit
    def stream(p_leaves, s, xx):
        def body(carry, _):
            if mode == "x_chain":
                p = jax.tree_util.tree_unflatten(treedef, p_leaves)
                out = apply_fn({"params": p, "batch_stats": s},
                               xx + carry.astype(xx.dtype) * 1e-12)
            else:
                lv = list(p_leaves)
                lv[idx] = lv[idx] + carry.astype(lv[idx].dtype) * 1e-12
                p = jax.tree_util.tree_unflatten(treedef, lv)
                out = apply_fn({"params": p, "batch_stats": s}, xx)
            return jnp.mean(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN)
        return acc

    float(stream(leaves, batch_stats, x))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(stream(leaves, batch_stats, x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / SCAN * 1000.0


def separate(apply_fn, params, batch_stats, x):
    import jax

    f = jax.jit(lambda v, xx: apply_fn(v, xx))
    v = {"params": params, "batch_stats": batch_stats}
    f(v, x).block_until_ready()
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(SCAN):
            out = f(v, x)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / SCAN * 1000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.models.fold_bn import fold_batchnorm

    model_bn = UNet(dtype=jnp.bfloat16)  # full w64
    key = jax.random.PRNGKey(0)
    folded = fold_batchnorm(dict(model_bn.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 64, 64, 4), jnp.float32), False)))
    model = model_bn.clone(normalization="none", fused_inference=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1088, 1920, 4)).astype(np.float32))

    os.environ["PCSS_CONVBLOCK_TAPS"] = "stack"
    apply_fn = lambda v, xx: model.apply(v, xx, False)  # noqa: E731
    for mode in ("tiny_leaf", "entry_leaf", "x_chain"):
        ms = chain_variant(apply_fn, folded["params"],
                           folded["batch_stats"], x, mode)
        print(json.dumps({"mode": mode, "ms_per_frame": round(ms, 2)}),
              flush=True)
    ms = separate(apply_fn, folded["params"], folded["batch_stats"], x)
    print(json.dumps({"mode": "separate_dispatch",
                      "ms_per_frame": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
