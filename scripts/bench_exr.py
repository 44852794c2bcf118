"""EXR codec throughput: native C++ vs pure-Python, single- and multi-thread.

The data-prep layer's cost is dominated by EXR decode (the reference spends
it inside the OpenEXR C++ bindings — setdata.py:42); this framework ships
its own codecs, so their throughput is a first-class number.  Measures, per
compression scheme, on a synthetic 4-channel G-buffer-like frame:

  - encode MB/s (raw plane bytes / wall time) per backend
  - decode MB/s per backend
  - decode scaling with N threads (the native codec releases the GIL for
    the full decode — io/exr.py; the Python codec serializes on it)

Host-only (no jax).  Prints one JSON line per (comp, backend) plus the
thread-scaling lines, then a summary table to stderr.

Usage: python scripts/bench_exr.py [--height 1080] [--width 1920]
                                   [--threads 8] [--reps 3]
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pcss_unet_tpu.io import exr_py  # noqa: E402
from pcss_unet_tpu.io.exr import _load_native, _read_channels_native, write_exr  # noqa: E402

COMPS = {"none": exr_py.COMP_NONE, "rle": exr_py.COMP_RLE,
         "zips": exr_py.COMP_ZIPS, "zip": exr_py.COMP_ZIP,
         "piz": exr_py.COMP_PIZ, "pxr24": exr_py.COMP_PXR24,
         "b44": exr_py.COMP_B44, "dwaa": exr_py.COMP_DWAA}
PY_ONLY = {}


def synth_frame(h: int, w: int) -> dict[str, np.ndarray]:
    """G-buffer-like planes: smooth depth/normals + binary-ish shadow map
    (realistic compressibility, unlike white noise)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(0)
    depth = 1.0 / (1.0 + 0.01 * (xx + 0.7 * yy)) + 0.01 * rng.standard_normal((h, w))
    return {
        "R": depth.astype(np.float32),
        "G": (0.5 + 0.4 * np.sin(xx / 37) * np.cos(yy / 29)).astype(np.float32),
        "B": (rng.random((h, w)) > 0.6).astype(np.float32),
        "A": np.ones((h, w), np.float32),
    }


def timed(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out_dir", default="/tmp/bench_exr")
    args = ap.parse_args()

    import os

    os.makedirs(args.out_dir, exist_ok=True)
    chans = synth_frame(args.height, args.width)
    raw_mb = 4 * args.height * args.width * 4 / 1e6
    have_native = _load_native() is not None
    names = ["R", "G", "B", "A"]
    rows = []

    all_comps = dict(COMPS)
    all_comps.update(PY_ONLY)
    for cname, comp in all_comps.items():
        path = os.path.join(args.out_dir, f"{cname}.exr")
        for backend in (("native", "python") if have_native else ("python",)):
            if backend == "native":
                enc = lambda: write_exr(path, chans, compression=comp)  # noqa: E731
                dec = lambda: _read_channels_native(path, names)  # noqa: E731
            else:
                enc = lambda: exr_py.write_exr_py(path, chans, compression=comp)  # noqa: E731
                dec = lambda: exr_py.read_exr_channels_py(path, names)  # noqa: E731
            t_enc = timed(enc, args.reps)
            size_mb = os.path.getsize(path) / 1e6
            t_dec = timed(dec, args.reps)
            row = {"comp": cname, "backend": backend,
                   "encode_mb_s": round(raw_mb / t_enc, 1),
                   "decode_mb_s": round(raw_mb / t_dec, 1),
                   "file_mb": round(size_mb, 2),
                   "ratio": round(raw_mb / size_mb, 2)}
            # thread scaling: N concurrent decodes of the same file
            if args.threads > 1:
                files = []
                for i in range(args.threads):
                    p = os.path.join(args.out_dir, f"{cname}_{i}.exr")
                    if backend == "native":
                        write_exr(p, chans, compression=comp)
                    else:
                        exr_py.write_exr_py(p, chans, compression=comp)
                    files.append(p)
                reader = (_read_channels_native if backend == "native"
                          else exr_py.read_exr_channels_py)

                def dec_all():
                    with cf.ThreadPoolExecutor(args.threads) as ex:
                        list(ex.map(lambda p: reader(p, names), files))

                t_mt = timed(dec_all, args.reps)
                row["decode_mb_s_mt"] = round(args.threads * raw_mb / t_mt, 1)
                row["mt_scaling"] = round(
                    row["decode_mb_s_mt"] / row["decode_mb_s"], 2)
            rows.append(row)
            print(json.dumps(row))

    hdr = (f"{'comp':7s} {'backend':8s} {'enc MB/s':>9s} {'dec MB/s':>9s} "
           f"{'dec MT':>9s} {'scale':>6s} {'ratio':>6s}")
    print("\n" + hdr, file=sys.stderr)
    for r in rows:
        print(f"{r['comp']:7s} {r['backend']:8s} {r['encode_mb_s']:9.1f} "
              f"{r['decode_mb_s']:9.1f} {r.get('decode_mb_s_mt', 0):9.1f} "
              f"{r.get('mt_scaling', 0):6.2f} {r['ratio']:6.2f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
