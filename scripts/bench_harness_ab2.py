#!/usr/bin/env python
"""Harness A/B round 2: scan-length sweep to separate hoisted work from
per-dispatch overhead.

If a chain mode honestly measures per-iteration model work, ms/frame is
invariant to scan length.  If part of the network is hoisted out of the
loop, ms/frame falls as scan length grows (hoisted cost amortizes).  If
separate-dispatch carries fixed per-call overhead, its ms/frame is flat
in scan count but sits above the honest in-loop number.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 5


def chain(apply_fn, params, batch_stats, x, mode, scan_len):
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(params)
    paths = jax.tree_util.tree_flatten_with_path(params)[0]
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

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=scan_len)
        return acc

    float(stream(leaves, batch_stats, x))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(stream(leaves, batch_stats, x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / scan_len * 1000.0


def separate(apply_fn, params, batch_stats, x, n):
    import jax

    f = jax.jit(lambda v, xx: apply_fn(v, xx))
    v = {"params": params, "batch_stats": batch_stats}
    f(v, x).block_until_ready()
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(v, x)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n * 1000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.models.fold_bn import fold_batchnorm

    model_bn = UNet(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    folded = fold_batchnorm(dict(model_bn.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 64, 64, 4), jnp.float32), False)))
    model = model_bn.clone(normalization="none", fused_inference=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1088, 1920, 4)).astype(np.float32))

    os.environ["PCSS_CONVBLOCK_TAPS"] = "stack"
    apply_fn = lambda v, xx: model.apply(v, xx, False)  # noqa: E731
    for mode in ("entry_leaf", "x_chain"):
        for scan_len in (8, 16, 32, 64):
            ms = chain(apply_fn, folded["params"], folded["batch_stats"],
                       x, mode, scan_len)
            print(json.dumps({"mode": mode, "scan": scan_len,
                              "ms_per_frame": round(ms, 2)}), flush=True)
    for n in (8, 16, 32):
        ms = separate(apply_fn, folded["params"], folded["batch_stats"], x, n)
        print(json.dumps({"mode": "separate", "n": n,
                          "ms_per_frame": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
