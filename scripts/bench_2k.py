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

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(model, params, batch_stats, h, w, scan_len, reps=4):
    import jax.numpy as jnp

    from pcss_unet_tpu.utils.benchlib import measure_ms_per_frame

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((1, h, w, 4)).astype(np.float32))
    return measure_ms_per_frame(lambda v, x: model.apply(v, x, False),
                                params, batch_stats, frames,
                                scan_len=scan_len, reps=reps)


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
    from pcss_unet_tpu.utils.benchlib import forward_flops

    for net, row in best.items():
        summary = {**row, "metric": "2k_best_ms_per_frame",
                   "paper_optimized_ms": 5.8,
                   "vs_paper_optimized": round(5.8 / row["value"], 3)}
        # roofline: XLA FLOP count of one plain-posture forward (posture-
        # independent op semantics) at this net's best measured latency
        try:
            m = UNet(encoder_widths=nets[net], dtype=jnp.bfloat16,
                     normalization="none")
            v = fold_batchnorm(dict(UNet(encoder_widths=nets[net],
                                         dtype=jnp.bfloat16).init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(0)},
                jnp.zeros((1, 64, 64, 4), jnp.float32), False)))
            fl = forward_flops(lambda vv, x: m.apply(vv, x, False),
                               v["params"], v["batch_stats"],
                               jnp.zeros((1, h, w, 4), jnp.float32))
            if fl:
                implied = fl / (row["value"] / 1e3) / 1e12
                summary["flops_per_frame_gflop"] = round(fl / 1e9, 2)
                summary["implied_tflops"] = round(implied, 1)
                summary["pct_of_peak_bf16"] = round(100 * implied / 197.0, 1)
        except Exception as e:  # noqa: BLE001
            print(f"flops({net}) failed: {e}", file=sys.stderr)
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
