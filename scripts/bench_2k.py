"""Whole-model latency at the paper's native 2048×1024 (BASELINE.md row 1).

The paper's fully-optimized trimmed net runs 5.8 ms/frame on an RTX 2080 Ti
(paper.md:143, 159); its trimmed fp32 net 28 ms, fp16 17 ms, unoptimized
U-Net >100 ms.  This sweeps {full w64, trimmed w16} × {plain bf16, fused,
fused+int8} × fused-kernel tap strategies with the same scan-chained
harness as bench.py (carry-dependent forwards in one dispatch — no LICM,
no DCE) and prints one JSON line per configuration plus a best-per-net
summary line.  Run on the chip:

    python scripts/bench_2k.py            # full sweep
    PCSS_BENCH_SMOKE=1 python scripts/bench_2k.py   # tiny CPU smoke
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(model, params, batch_stats, h, w, scan_len, reps=4):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stream(p, s, x):
        def body(carry, _):
            out = model.apply({"params": p, "batch_stats": s},
                              x + carry * 1e-12, False)
            return jnp.mean(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=scan_len)
        return acc

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((1, h, w, 4)).astype(np.float32))
    float(stream(params, batch_stats, frames))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(stream(params, batch_stats, frames))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / scan_len * 1000.0  # ms/frame


def main() -> None:
    smoke = os.environ.get("PCSS_BENCH_SMOKE") == "1"
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.models.fold_bn import fold_batchnorm

    h = 128 if smoke else 1024
    w = 256 if smoke else 2048
    scan_len = 2 if smoke else 32
    nets = {"w16": (16, 32, 128, 256)} if smoke else {
        "w64": (64, 128, 512, 1024), "w16": (16, 32, 128, 256)}

    best: dict[str, dict] = {}
    for net, widths in nets.items():
        model_bn = UNet(encoder_widths=widths, dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        variables = model_bn.init({"params": key, "dropout": key},
                                  jnp.zeros((1, 64, 64, 4), jnp.float32),
                                  False)
        folded = fold_batchnorm(dict(variables))
        params, batch_stats = folded["params"], folded["batch_stats"]
        postures = {
            "plain": model_bn.clone(normalization="none"),
            "fused": model_bn.clone(normalization="none",
                                    fused_inference=True),
            "fused_int8": model_bn.clone(normalization="none",
                                         fused_inference=True,
                                         int8_inference=True),
        }
        for posture, model in postures.items():
            taps_options = (("stack",) if posture == "plain" or smoke
                            else ("stack", "acc_shift"))
            for taps in taps_options:
                os.environ["PCSS_CONVBLOCK_TAPS"] = taps
                try:
                    ms = measure(model, params, batch_stats, h, w, scan_len)
                except Exception as e:  # noqa: BLE001 — e.g. VMEM exhausted
                    print(f"{net}/{posture}/{taps} failed: {e}",
                          file=sys.stderr)
                    continue
                finally:
                    os.environ.pop("PCSS_CONVBLOCK_TAPS", None)
                row = {"metric": "2k_inference_ms_per_frame", "net": net,
                       "posture": posture, "taps": taps,
                       "value": round(ms, 2), "unit": "ms/frame",
                       "frame": f"{w}x{h}",
                       "fps_per_chip": round(1000.0 / ms, 1)}
                print(json.dumps(row), flush=True)
                if net not in best or ms < best[net]["value"]:
                    best[net] = row
    for net, row in best.items():
        print(json.dumps({**row, "metric": "2k_best_ms_per_frame",
                          "paper_optimized_ms": 5.8,
                          "vs_paper_optimized": round(5.8 / row["value"], 3)}),
              flush=True)


if __name__ == "__main__":
    main()
