"""Extract libOpenEXR's DWA nonlinear transfer tables empirically.

DWA's LOSSY_DCT path runs every half through a baked 65536-entry
perceptual LUT pair (toNonlinear on encode, toLinear on decode).  The
curve is piecewise — x^(1/2.2) on |x| ≤ 1, 1 + ln(x)/2.2 above — but the
shipped tables carry their own rounding (half the entries differ from a
straight half-rounded formula by one ulp, small values flush to zero),
so bit-exact interop with files written by libOpenEXR requires the
actual tables.  This script extracts both directions through the
tests/oracle/exr_oracle CLI against the REAL system libOpenEXR:

- toNonlinear: write a DWAA file of constant 8x8 blocks, one per finite
  half value, at compression level 0 (zero quantization budget).  Each
  block's stored DC coefficient is exactly 8 * toNonlinear(x) and x8 is
  exact in half arithmetic, so the DC segment IS the table.
- toLinear: monkeypatch OUR encoder's toNonlinear to identity so the DC
  holds the raw probe value, then let libOpenEXR decode the file — its
  output is toLinear(x) per block.

Outputs:
- pcss_unet_tpu/io/dwa_luts.npz  (uint16[65536] x 2, half bit patterns)
- native/exr/dwa_luts.h          (same tables as C arrays; generated)

Entries the probes cannot reach (NaN/Inf inputs; |x| >= 8160 for
toLinear, where the x8 DC trick overflows) are filled from the formula:
pass-through for non-finite, the log branch (saturating to +/-inf in
half) for large toLinear inputs.  Every reachable entry is empirical.

Usage: python scripts/extract_dwa_luts.py  (requires the oracle to build;
see tests/oracle/Makefile).
"""

import os
import struct
import subprocess
import sys
import zlib

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(ROOT, "tests", "oracle", "exr_oracle")
sys.path.insert(0, ROOT)


def _dc_segment(path: str) -> np.ndarray:
    from pcss_unet_tpu.io import exr_py
    from pcss_unet_tpu.io.exr_py import _zip_undo_transform

    raw = open(path, "rb").read()
    f = exr_py.ExrFile(raw)
    off = f._chunk_offsets[0]
    _, size = struct.unpack_from("<ii", raw, off)
    payload = raw[off + 8: off + 8 + size]
    hdr = struct.unpack_from("<11Q", payload, 0)
    pos = 88
    if hdr[0] >= 2:
        (rs,) = struct.unpack_from("<H", payload, pos)
        pos += rs
    pos += hdr[2] + hdr[3]
    return np.frombuffer(
        _zip_undo_transform(bytearray(zlib.decompress(
            payload[pos:pos + hdr[4]]))), np.uint16)


def formula_nl(x: np.ndarray) -> np.ndarray:
    """The analytic curve (used only for probe-unreachable entries)."""
    with np.errstate(invalid="ignore", over="ignore", divide="ignore"):
        a = np.abs(x)
        nl = np.where(a <= 1.0, a ** (1.0 / 2.2), 1.0 + np.log(a) / 2.2)
        nl = np.sign(x) * nl
        nl[~np.isfinite(x)] = x[~np.isfinite(x)]
    return nl.astype(np.float16).view(np.uint16)


def formula_lin(x: np.ndarray) -> np.ndarray:
    with np.errstate(invalid="ignore", over="ignore"):
        a = np.abs(x)
        lin = np.where(a <= 1.0, a ** 2.2, np.exp(2.2 * (a - 1.0)))
        lin = np.sign(x) * lin
        lin[~np.isfinite(x)] = x[~np.isfinite(x)]
    return lin.astype(np.float16).view(np.uint16)


def extract_to_nonlinear(tmp: str) -> np.ndarray:
    bits = np.arange(65536, dtype=np.uint16)
    x = bits.view(np.float16).astype(np.float32)
    finite = np.isfinite(x)
    vals = x[finite]
    plane = np.repeat(np.repeat(vals[None, :], 8, axis=0), 8, axis=1)
    bin_path = os.path.join(tmp, "nl.bin")
    exr_path = os.path.join(tmp, "nl.exr")
    plane[None].astype(np.float32).tofile(bin_path)
    subprocess.run([ORACLE, "write", exr_path, "dwaa",
                    str(plane.shape[1]), "8", "G:half", bin_path,
                    "--level", "0"], check=True)
    dc = _dc_segment(exr_path)
    assert dc.size == vals.size, (dc.size, vals.size)
    nl8 = dc.view(np.float16).astype(np.float32)
    table = formula_nl(x)                        # non-finite pass-through
    table[finite] = (nl8 / 8.0).astype(np.float16).view(np.uint16)
    return table


def extract_to_linear(tmp: str) -> np.ndarray:
    from pcss_unet_tpu.io import dwa
    from pcss_unet_tpu.io.exr import PT_HALF, write_exr

    os.environ["PCSS_EXR_BACKEND"] = "python"
    saved = dwa._TO_NONLINEAR
    dwa._TO_NONLINEAR = np.arange(65536, dtype=np.uint16)  # identity
    try:
        bits = np.arange(65536, dtype=np.uint16)
        x = bits.view(np.float16).astype(np.float32)
        probe = np.isfinite(x) & (np.abs(x) < 8160.0)      # x8 stays finite
        vals = x[probe]
        plane = np.repeat(np.repeat(vals[None, :], 8, axis=0), 8, axis=1)
        exr_path = os.path.join(tmp, "lin.exr")
        write_exr(exr_path, {"G": plane.astype(np.float32)},
                  compression=8, pixel_type=PT_HALF)
        bin_path = os.path.join(tmp, "lin.bin")
        r = subprocess.run([ORACLE, "dump", exr_path, bin_path],
                           check=True, capture_output=True, text=True)
        w = int(r.stdout.split()[0])
        ref = np.fromfile(bin_path, np.float32).reshape(8, w)
        lin = ref[0, ::8]
        assert lin.size == vals.size
        table = formula_lin(x)                   # log-branch saturation
        table[probe] = lin.astype(np.float16).view(np.uint16)
        return table
    finally:
        dwa._TO_NONLINEAR = saved


def write_native_header(path: str, nl: np.ndarray, lin: np.ndarray) -> None:
    def rows(t):
        words = [f"0x{v:04x}" for v in t]
        return ",\n    ".join(", ".join(words[i:i + 8])
                              for i in range(0, 65536, 8))
    with open(path, "w") as f:
        f.write(
            "// GENERATED by scripts/extract_dwa_luts.py — libOpenEXR's\n"
            "// DWA perceptual transfer tables, extracted empirically from\n"
            "// the system library via tests/oracle/exr_oracle.  Half bit\n"
            "// patterns in, half bit patterns out.  Do not edit.\n"
            "#pragma once\n#include <stdint.h>\n\n"
            "static const uint16_t kDwaToNonlinear[65536] = {\n    "
            + rows(nl) + "\n};\n\n"
            "static const uint16_t kDwaToLinear[65536] = {\n    "
            + rows(lin) + "\n};\n")


def main():
    if not os.path.exists(ORACLE):
        r = subprocess.run(["make", "-C", os.path.dirname(ORACLE)],
                           capture_output=True, text=True)
        if r.returncode != 0:
            sys.exit(f"oracle build failed:\n{r.stderr}")
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        nl = extract_to_nonlinear(tmp)
        lin = extract_to_linear(tmp)
    out = os.path.join(ROOT, "pcss_unet_tpu", "io", "dwa_luts.npz")
    np.savez_compressed(out, to_nonlinear=nl, to_linear=lin)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")
    hdr = os.path.join(ROOT, "native", "exr", "dwa_luts.h")
    write_native_header(hdr, nl, lin)
    print(f"wrote {hdr} ({os.path.getsize(hdr)} bytes)")


if __name__ == "__main__":
    main()
