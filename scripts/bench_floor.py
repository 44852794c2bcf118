"""Floor discrimination for the small-channel fused ConvBlock (w16@2K).

Motivation (docs/BENCHMARKS.md "Stacked-tap contraction" + bench_s2d):
the w16 stage at QUARTER resolution costs almost the same as at full
resolution (1.10 vs 1.20 ms), i.e. the per-stage cost is dominated by a
component that does not scale with pixel count.  Candidate explanations:
(a) the NHWC↔channels-major XLA transposes around the kernel,
(b) per-grid-step overhead (bands = H/k_rows iterations),
(c) the MXU contraction itself (M=Cmid=16 → 12.5 % row fill).

This script separates them on the chip: for each stage size it times
  1. the transpose pair alone (NHWC→CHW→NHWC round trip),
  2. the CHW kernel core alone (no transposes) at several k_rows,
  3. the full NHWC wrapper (what the model runs),
and prints roofline context (GFLOP, MB moved, implied TFLOP/s).
Scan-chained timing (carry-dependent passes in one dispatch) as in
bench_convblock.py.  Run: python scripts/bench_floor.py   (TPU)
Smoke: PCSS_BENCH_SMOKE=1 python scripts/bench_floor.py   (CPU interpret)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = os.environ.get("PCSS_BENCH_SMOKE") == "1"
SCAN_LEN = 2 if SMOKE else 20
REPS = 2 if SMOKE else 5


def timed(fn, *args):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stream(*xs):
        def body(carry, _):
            out = fn(xs[0] + carry * 1e-12, *xs[1:])
            return jnp.mean(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN_LEN)
        return acc

    float(stream(*args))  # compile + warm
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(stream(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / SCAN_LEN * 1000  # ms per pass


def main() -> None:
    import jax.numpy as jnp

    from pcss_unet_tpu.ops.pallas.convblock import (
        _pick_k_rows, fused_conv_block_chw, fused_conv_block_nhwc,
    )

    interpret = SMOKE
    sizes = ([(32, 128)] if SMOKE
             else [(512, 1024), (256, 512), (128, 256)])
    cin = cmid = cout = 16
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.standard_normal((9, cmid, cin)), jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((cmid, 1)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((cout, cmid)), jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((cout, 1)), jnp.bfloat16)

    for h, w in sizes:
        wp = (w // 128 + 1) * 128
        x_nhwc = jnp.asarray(rng.standard_normal((1, h, w, cin)),
                             jnp.bfloat16)
        x_chw = jnp.asarray(rng.standard_normal((1, cin, h, wp)),
                            jnp.bfloat16)
        gflop = h * w * (9 * cin * cmid + cmid * cout) * 2 / 1e9
        mb = (h * w * (cin + cout) * 2) / 1e6

        t_tr = timed(lambda x: x.transpose(0, 3, 1, 2).transpose(0, 2, 3, 1)
                     + 0, x_nhwc)
        row = {"stage": f"{cin}->{cmid}->{cout}@{h}x{w}",
               "gflop": round(gflop, 3), "mb_inout": round(mb, 1),
               "transpose_pair_ms": round(t_tr, 3)}

        auto_k = _pick_k_rows(cin, cmid, cout, wp, itemsize=2,
                              acc_shift=False)
        for k_rows in sorted({8, 16, 32, 64, auto_k}):
            if h % k_rows:
                continue
            core = functools.partial(
                fused_conv_block_chw, w1=w1, b1=b1, w2=w2, b2=b2,
                k_rows=k_rows, stack_taps=True, interpret=interpret)
            try:
                t_core = timed(core, x_chw)
            except Exception as e:  # noqa: BLE001 — VMEM etc.
                row[f"core_k{k_rows}_ms"] = f"fail: {str(e)[:60]}"
                continue
            tag = f"core_k{k_rows}_ms" + ("*" if k_rows == auto_k else "")
            row[tag] = round(t_core, 3)
            row.setdefault("best_core_ms", t_core)
            row["best_core_ms"] = min(row["best_core_ms"], t_core)
        nhwc = functools.partial(fused_conv_block_nhwc, w1=w1, b1=b1,
                                 w2=w2, b2=b2, stack_taps=True,
                                 interpret=interpret)
        row["nhwc_total_ms"] = round(timed(nhwc, x_nhwc), 3)
        if isinstance(row.get("best_core_ms"), float):
            row["implied_tflops_core"] = round(
                gflop / row["best_core_ms"], 2)
            row["best_core_ms"] = round(row["best_core_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
