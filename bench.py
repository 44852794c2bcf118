"""Headline benchmark: 1080p shadow-mask inference throughput per chip.

Flagship model (reference U-Net configuration, bf16) on 1920×1080 frames
(padded to 1920×1088, ×16 alignment).  North star (BASELINE.json): ≥2000
1080p frames/min on a v5e-8 ≙ 4.167 frames/sec/chip — ``vs_baseline`` is
measured fps/chip divided by that.  Prints exactly ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS_PER_CHIP = 2000.0 / 60.0 / 8.0  # north-star per chip
V5E_PEAK_BF16_TFLOPS = 197.0  # per-chip bf16 MXU peak (v5e); int8 is 2×


def _device_reachable(attempts: int = 3, timeout_s: int = 240) -> bool:
    """Bounded probe of backend init in a subprocess.  On this image the
    TPU tunnel's PJRT client blocks *indefinitely* inside backend init when
    the tunnel is down — an unguarded jax.devices() here would hang the
    whole benchmark run rather than fail.  Probing in a child with a
    timeout turns that hang into a clean, reportable failure."""
    import subprocess

    for i in range(attempts):
        try:
            p = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices()[0])"],
                capture_output=True, text=True, timeout=timeout_s)
            if p.returncode == 0:
                return True
            print(f"device probe {i + 1}/{attempts} failed: "
                  f"{p.stderr.strip()[-300:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"device probe {i + 1}/{attempts} timed out "
                  f"({timeout_s}s): backend init is blocking", file=sys.stderr)
        if i < attempts - 1:  # no pointless sleep after the final failure
            time.sleep(30)
    return False


_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "logs", "bench_last_good.json")


def main() -> None:
    if os.environ.get("PCSS_BENCH_SMOKE") != "1" and not _device_reachable():
        out = {
            "metric": "1080p_inference_frames_per_sec_per_chip",
            "value": 0.0, "unit": "frames/sec", "vs_baseline": 0.0,
            "error": "accelerator unreachable: backend init failed/hung "
                     "after bounded probes (TPU tunnel down?)",
        }
        try:
            with open(_LAST_GOOD) as f:
                # context only — NOT a fresh measurement (value stays 0.0)
                out["last_known_good"] = json.load(f)
        except (OSError, ValueError):
            pass
        print(json.dumps(out))
        sys.exit(1)
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    from pcss_unet_tpu.infer.frame import InferenceEngine
    from pcss_unet_tpu.models import UNet

    from pcss_unet_tpu.models.fold_bn import fold_batchnorm

    model_bn = UNet(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = model_bn.init({"params": key, "dropout": key},
                              jnp.zeros((1, 64, 64, 4), jnp.float32), False)
    # deployment posture: BatchNorm folded into the convs (exact at eval),
    # small-channel blocks through the fused Pallas ConvBlock kernel
    # (ops/pallas/convblock.py), ≥256-channel blocks through dynamic-int8
    # convs on the int8 MXU (ops/int8.py; 71.5 dB vs the float graph) —
    # docs/BENCHMARKS.md — with the plain XLA graph as per-config fallback.
    folded = fold_batchnorm(dict(variables))
    models = {"fused_int8": model_bn.clone(normalization="none",
                                           fused_inference=True,
                                           int8_inference=True),
              "fused": model_bn.clone(normalization="none",
                                      fused_inference=True),
              "plain": model_bn.clone(normalization="none")}
    params = folded["params"]
    batch_stats = folded["batch_stats"]

    # smoke knobs (CI/CPU): shrink the frame / scan without changing the
    # measured configuration on real hardware (defaults = the real bench)
    h = int(os.environ.get("PCSS_BENCH_H", 1088))
    w = int(os.environ.get("PCSS_BENCH_W", 1920))
    rng = np.random.default_rng(0)

    from pcss_unet_tpu.utils.benchlib import (forward_flops,
                                              measure_ms_per_frame)

    best_fps = 0.0
    best_batch = 1
    best_impl = "plain"
    best_taps = "stack"
    # taps: fused-ConvBlock tap strategy (ops/pallas/convblock.py) — read
    # from the env at trace time, so set it before each jit traces.
    # Measurement: the canonical input-chained scan with two-point
    # scan-length differencing (utils/benchlib.py) — every forward depends
    # on the previous one through the input (nothing hoists), and the
    # fixed per-dispatch relay cost cancels in the difference.  Validated
    # against separate block_until_ready dispatches on hardware
    # (scripts/bench_harness_ab2.py).
    def apply_for(impl, taps):
        m = models[impl]
        return lambda v, x: m.apply(v, x, False)

    def probe_ms(impl, taps, batch, th, tw, scan_len, widths):
        """Measure a chw candidate in a killable child (scripts/
        bench_probe.py): a wedged remote Mosaic compile blocks in C++
        where no in-process exception or signal can land — observed on
        hardware (w64 chw compile hung >60 min on a sick tunnel).  A
        timeout here skips the candidate instead of hanging the bench."""
        import subprocess
        timeout_s = int(os.environ.get("PCSS_BENCH_PROBE_TIMEOUT", 1500))
        script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "bench_probe.py")
        p = subprocess.run(
            [sys.executable, script, "--impl", impl, "--taps", taps,
             "--batch", str(batch), "--height", str(th), "--width", str(tw),
             "--scan", str(scan_len or 0), "--widths", widths,
             "--skip_flops"],
            capture_output=True, text=True, timeout=timeout_s)
        if p.returncode != 0:
            raise RuntimeError(f"probe failed: {p.stderr.strip()[-300:]}")
        return json.loads(p.stdout.strip().splitlines()[-1])["ms_per_frame"]

    # The w64 chw candidates run through the killable probe: the earlier
    # "reproducible wedge" was root-caused (round 4) to the DIAGNOSTIC
    # closing over device weights — lower() fetched them through the
    # tunnel as MLIR constants (scripts/diag_chw_w64.py's note).  The
    # production path passes params as arguments, and a genuinely sick
    # tunnel still just costs the probe timeout, not the bench.
    for batch, scan_len, impl, taps in (
            (1, 32, "fused_int8", "stack"), (1, 32, "fused_int8", "acc_shift"),
            (1, 32, "fused", "stack"), (1, 32, "plain", "stack"),
            (1, 0, "chw_int8", "stack"), (1, 0, "chw", "stack"),
            (2, 16, "fused_int8", "stack"), (4, 8, "fused_int8", "stack")):
        os.environ["PCSS_CONVBLOCK_TAPS"] = taps
        try:
            if impl.startswith("chw"):
                ms = probe_ms(impl, taps, batch, h, w, scan_len,
                              "64,128,512,1024")
            else:
                frames = jnp.asarray(
                    rng.standard_normal((batch, h, w, 4)).astype(np.float32))
                ms = measure_ms_per_frame(
                    apply_for(impl, taps),
                    params, batch_stats, frames, scan_len=scan_len)
            fps = 1000.0 / ms
            if fps > best_fps:
                best_fps, best_batch, best_impl, best_taps = (
                    fps, batch, impl, taps)
        except Exception as e:  # noqa: BLE001 - e.g. HBM/VMEM exhausted,
            # probe timeout/crash (subprocess.TimeoutExpired is an Exception)
            print(f"batch {batch} ({impl},{taps}) failed: {e}",
                  file=sys.stderr)
            continue
        finally:
            os.environ.pop("PCSS_CONVBLOCK_TAPS", None)

    # Roofline accounting (VERDICT r3 weak #3): XLA's FLOP count of one
    # PLAIN-posture forward — posture-independent op semantics, the same
    # convention as scripts/bench_2k.py.  (The fused Pallas stages report
    # no flops to cost analysis, so counting the winning posture's
    # executable would understate the model's work by ~6×.)  Implied
    # TFLOP/s = that op count at the winning posture's measured rate.
    flops_per_frame = None
    try:
        fl_frames = jnp.asarray(rng.standard_normal(
            (best_batch, h, w, 4)).astype(np.float32))
        total = forward_flops(apply_for("plain", "stack"),
                              params, batch_stats, fl_frames)
        if total:
            flops_per_frame = total / best_batch
    except Exception as e:  # noqa: BLE001 — roofline keys are best-effort
        print(f"flops accounting failed: {e}", file=sys.stderr)

    # Secondary: trimmed w16 net at the paper-native 2048×1024 (the
    # BASELINE.md row-1 comparison point, paper's optimized net = 5.8 ms).
    # Same canonical harness and settings as scripts/bench_2k.py, so the
    # two artifacts agree by construction.  Reported as extra keys on the
    # same JSON line; failures are dropped silently so the headline always
    # prints.
    trimmed_2k_ms = None
    trimmed_2k_impl = None
    try:
        t_bn = UNet(encoder_widths=(16, 32, 128, 256), dtype=jnp.bfloat16)
        t_vars = t_bn.init({"params": key, "dropout": key},
                           jnp.zeros((1, 64, 64, 4), jnp.float32), False)
        t_folded = fold_batchnorm(dict(t_vars))
        t_model = t_bn.clone(normalization="none", fused_inference=True,
                             int8_inference=True)
        th = int(os.environ.get("PCSS_BENCH_2K_H", 1024))
        tw = int(os.environ.get("PCSS_BENCH_2K_W", 2048))
        os.environ["PCSS_CONVBLOCK_TAPS"] = "stack"
        t_frames = jnp.asarray(
            rng.standard_normal((1, th, tw, 4)).astype(np.float32))
        for t_impl in ("chw", "fused_int8"):
            try:
                if t_impl == "chw":
                    t_ms = probe_ms("chw", "stack", 1, th, tw, None,
                                    "16,32,128,256")
                else:
                    t_ms = measure_ms_per_frame(
                        lambda v, x: t_model.apply(v, x, False),
                        t_folded["params"], t_folded["batch_stats"],
                        t_frames)
            except Exception as e:  # noqa: BLE001
                print(f"trimmed-2K {t_impl} failed: {e}", file=sys.stderr)
                continue
            if trimmed_2k_ms is None or t_ms < trimmed_2k_ms:
                trimmed_2k_ms, trimmed_2k_impl = round(t_ms, 2), t_impl
    except Exception as e:  # noqa: BLE001
        print(f"trimmed-2K secondary failed: {e}", file=sys.stderr)
    finally:
        os.environ.pop("PCSS_CONVBLOCK_TAPS", None)

    # Trimmed-2K THROUGHPUT posture: same net, batch>1 — the renderer-loop
    # comparison point is per-frame latency (above), but a farm/offline
    # consumer cares about frames/sec/chip, where batching amortizes the
    # per-dispatch fixed cost.  Reported separately; never replaces the
    # latency key.
    trimmed_2k_tp_ms = None
    trimmed_2k_tp_batch = None
    if trimmed_2k_ms is not None:
        for t_batch in (2, 4):
            try:
                t_ms = probe_ms("chw", "stack", t_batch, th, tw, None,
                                "16,32,128,256")
            except Exception as e:  # noqa: BLE001
                print(f"trimmed-2K batch{t_batch} failed: {e}",
                      file=sys.stderr)
                continue
            if trimmed_2k_tp_ms is None or t_ms < trimmed_2k_tp_ms:
                trimmed_2k_tp_ms = round(t_ms, 2)
                trimmed_2k_tp_batch = t_batch

    result = {
        "metric": "1080p_inference_frames_per_sec_per_chip",
        "value": round(best_fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(best_fps / BASELINE_FPS_PER_CHIP, 3),
        "batch": best_batch,
        "impl": best_impl,
        "taps": best_taps,
        "device": str(jax.devices()[0]),
        "dtype": "bfloat16",
        "frame": f"{w}x{h}",
        # vs_baseline divides the v5e-8 north star by 8, i.e. assumes linear
        # 8-chip scaling; per-frame inference is embarrassingly parallel
        # (independent frames per chip, no collectives), but the sharded
        # single-frame path's scaling efficiency is unmeasured on real
        # multi-chip hardware (VERDICT r1 weak #8).
        "note": "per-chip rate; 8-chip north star assumed linear (independent frames)",
    }
    if flops_per_frame:
        implied_tflops = flops_per_frame * best_fps / 1e12
        result["flops_per_frame"] = round(flops_per_frame / 1e9, 2)  # GFLOP
        result["implied_tflops"] = round(implied_tflops, 1)
        result["pct_of_peak_bf16"] = round(
            100.0 * implied_tflops / V5E_PEAK_BF16_TFLOPS, 1)
    if trimmed_2k_ms is not None:
        result["trimmed_2k_ms_per_frame"] = trimmed_2k_ms
        result["trimmed_2k_impl"] = trimmed_2k_impl
        result["trimmed_2k_vs_paper_optimized_5.8ms"] = round(
            5.8 / trimmed_2k_ms, 3)
    if trimmed_2k_tp_ms is not None:
        result["trimmed_2k_throughput_ms_per_frame"] = trimmed_2k_tp_ms
        result["trimmed_2k_throughput_batch"] = trimmed_2k_tp_batch
        result["trimmed_2k_throughput_fps"] = round(
            1000.0 / trimmed_2k_tp_ms, 1)
    if (best_fps > 0 and "TPU" in result["device"]
            and os.environ.get("PCSS_BENCH_SMOKE") != "1"):
        # never persist smoke-shrunk frames as the last-known-good
        try:
            os.makedirs(os.path.dirname(_LAST_GOOD), exist_ok=True)
            with open(_LAST_GOOD, "w") as f:
                json.dump(dict(result, measured_at=time.time()), f)
        except OSError:
            pass  # persistence is best-effort; the JSON line still prints
    print(json.dumps(result))


if __name__ == "__main__":
    main()
