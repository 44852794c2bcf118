#!/usr/bin/env python
"""End-to-end serving benchmark: EXR bytes in → uint8 masks out, on-chip
(VERDICT r3 next-#6).  The headline fps excludes host decode; the
reference's real consumer is a renderer loop, so this measures the full
pipeline server (infer/server.py) with decode in the loop:

- generates a directory of real compressed 1080p EXRs (DWAA and PIZ — the
  codecs a renderer would hand us), then
- streams them through ShadowServer at the deployment posture
  (BN-folded + fused/int8 kernels) and reports sustained fps, p50/p99
  per-frame latency, decode/dispatch/sync split, and the overlap factor
  (end-to-end fps vs the compute-only and decode-only ceilings).

    python scripts/bench_serve.py                 # on the chip
    PCSS_BENCH_SMOKE=1 python scripts/bench_serve.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_frames(root: str, n: int, h: int, w: int, compression: str) -> list:
    from pcss_unet_tpu.io.exr import write_exr

    rng = np.random.default_rng(0)
    # renderer-plausible content: smooth G-buffer fields compress far more
    # realistically than white noise (DWA/PIZ rates are content-dependent)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    paths = []
    for i in range(n):
        base = np.sin(xx / (40 + i) + i) * np.cos(yy / (60 + i))
        chans = {
            "R": (base + 0.05 * rng.standard_normal((h, w))).astype(np.float32),
            "G": (base * 0.5 + 0.3).astype(np.float32),
            "B": (xx / w + 0.02 * rng.standard_normal((h, w))).astype(np.float32),
            "A": np.ones((h, w), np.float32),
        }
        p = os.path.join(root, f"f{i:04d}.exr")
        write_exr(p, chans, compression=compression)
        paths.append(p)
    return paths


def main() -> None:
    smoke = os.environ.get("PCSS_BENCH_SMOKE") == "1"
    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    from pcss_unet_tpu.infer import InferenceEngine
    from pcss_unet_tpu.infer.server import ShadowServer
    from pcss_unet_tpu.io.exr import read_exr_stack
    from pcss_unet_tpu.models import UNet

    h, w = (96, 160) if smoke else (1080, 1920)
    n = 8 if smoke else 96
    model = UNet(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = dict(model.init({"params": key, "dropout": key},
                                jnp.zeros((1, 64, 64, 4), jnp.float32),
                                False))

    for compression in ("DWAA", "PIZ"):
        with tempfile.TemporaryDirectory() as root:
            paths = make_frames(root, n, h, w, compression)
            for batch, workers in ((1, 4), (4, 8)) if not smoke else ((2, 2),):
                engine = InferenceEngine(model, variables,
                                         dtype=jnp.bfloat16, fold_bn=True,
                                         quantize="int8")
                server = ShadowServer(engine, batch_size=batch,
                                      decode_workers=workers)
                sink_count = [0]
                # warm compile outside the timed run (one batch shape)
                first = read_exr_stack(paths[0])
                engine(np.stack([first] * batch) if batch > 1 else first)
                stats = server.run(
                    paths, lambda p, m: sink_count.__setitem__(
                        0, sink_count[0] + 1))
                # ceilings for the overlap accounting
                t0 = time.perf_counter()
                for p in paths[:16]:
                    read_exr_stack(p)
                decode_fps = 16 / (time.perf_counter() - t0) * workers
                compute_fps = (stats.frames /
                               max(stats.compute_seconds
                                   + stats.sync_seconds, 1e-9))
                ceiling = min(decode_fps, compute_fps)
                print(json.dumps({
                    "metric": "serve_e2e_fps", "value": round(stats.fps, 1),
                    "unit": "frames/sec", "frame": f"{w}x{h}",
                    "compression": compression, "batch": batch,
                    "decode_workers": workers, "frames": stats.frames,
                    "p50_ms": round(stats.p50_ms, 1),
                    "p99_ms": round(stats.p99_ms, 1),
                    "decode_s": round(stats.decode_seconds, 2),
                    "dispatch_s": round(stats.compute_seconds, 2),
                    "sync_s": round(stats.sync_seconds, 2),
                    "wall_s": round(stats.wall_seconds, 2),
                    "decode_only_fps_ceiling": round(decode_fps, 1),
                    "compute_side_fps": round(compute_fps, 1),
                    "pipeline_efficiency_vs_ceiling": round(
                        stats.fps / ceiling, 3) if ceiling else None,
                }), flush=True)


if __name__ == "__main__":
    main()
