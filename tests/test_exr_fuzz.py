"""Crash-safety fuzz of the native EXR codec.

The native decoder runs GIL-free inside data-loader threads; a segfault
on a corrupt file would take the whole training process down, so every
malformed input must surface as a clean Python-level error.  A bounded,
deterministic corpus (truncations + byte flips of valid files across the
compression schemes, scanline/tiled/multi-part) is decoded in ONE child
process so an abort/segv is detected as a crash (nonzero exit, with the
offending case in its stdout tail) rather than killing the test runner.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from pcss_unet_tpu.io import exr_py
from pcss_unet_tpu.io.exr import _load_native, write_exr

_CHILD = r"""
import glob
import sys
from pcss_unet_tpu.io.exr import _read_channels_native
for path in sorted(glob.glob(sys.argv[1] + "/fuzz_*.exr")):
    print(path, flush=True)   # last printed line identifies a crash case
    try:
        _read_channels_native(path, ["R", "G", "B", "A"], part=0)
    except Exception:
        pass  # clean error = pass
print("ALL_OK")
"""


def _make_corpus(tmp_path, rng):
    h, w = 24, 40
    chans = {n: rng.standard_normal((h, w)).astype(np.float32)
             for n in ("R", "G", "B", "A")}
    paths = []
    for comp in (exr_py.COMP_NONE, exr_py.COMP_RLE, exr_py.COMP_ZIP,
                 exr_py.COMP_PIZ, exr_py.COMP_PXR24, exr_py.COMP_B44A,
                 exr_py.COMP_DWAA):
        p = str(tmp_path / f"c{comp}.exr")
        write_exr(p, chans, compression=comp)
        paths.append(p)
    p = str(tmp_path / "tiled.exr")
    write_exr(p, chans, compression=exr_py.COMP_ZIP, tile_size=(16, 16))
    paths.append(p)
    p = str(tmp_path / "mp.exr")
    exr_py.write_exr_multipart_py(
        p, [("a", {"R": chans["R"]}), ("b", {"Z": chans["G"]})])
    paths.append(p)
    return paths


def test_native_decode_survives_corruption(tmp_path, rng):
    if _load_native() is None:
        pytest.skip("native EXR codec unavailable")
    paths = _make_corpus(tmp_path, rng)
    frng = np.random.default_rng(1234)
    n_cases = 0
    for src in paths:
        data = open(src, "rb").read()
        cases = []
        # truncations: header region, offset table, mid-payload
        for frac in (0.02, 0.1, 0.35, 0.7, 0.95):
            cases.append(data[: int(len(data) * frac)])
        # byte flips (3 per case; deterministic)
        for _ in range(6):
            b = bytearray(data)
            for _ in range(3):
                i = int(frng.integers(0, len(b)))
                b[i] ^= int(frng.integers(1, 256))
            cases.append(bytes(b))
        # length-field sabotage: overwrite 4-byte words early in the file
        for off in (8, 64, 200):
            if off + 4 <= len(data):
                b = bytearray(data)
                b[off:off + 4] = b"\xff\xff\xff\x7f"
                cases.append(bytes(b))
        tag = os.path.basename(src).split(".")[0]
        for j, payload in enumerate(cases):
            with open(tmp_path / f"fuzz_{tag}_{j:02d}.exr", "wb") as f:
                f.write(payload)
            n_cases += 1
    assert n_cases >= 100
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, str(tmp_path)],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0 and "ALL_OK" in p.stdout, (
        f"native decode crashed (rc={p.returncode}) on case: "
        f"{p.stdout.strip().splitlines()[-1:] or '?'}\n{p.stderr[-500:]}")


def test_dwa_rules_block_corruption(tmp_path, rng):
    """Targeted mutations of the version-2 DWA channel-rules block (new
    in round 3: the block is parsed and APPLIED, not skipped).  Both
    codecs must fail cleanly — no crash/abort — on a sabotaged size
    field, unterminated suffix, out-of-range scheme/type bytes, or a
    rules block claiming to extend past the chunk.  (A mutation that
    still parses into a structurally valid rule set legitimately decodes
    BY those rules — garbage in, garbage out — so only crash-safety is
    asserted; decodes run in a child process so an abort is a test
    failure, not a runner kill.)"""
    import struct

    h, w = 24, 40
    chans = {n: rng.standard_normal((h, w)).astype(np.float32)
             for n in ("R", "G", "B", "A")}
    src = str(tmp_path / "dwa.exr")
    write_exr(src, chans, compression=exr_py.COMP_DWAA)
    data = open(src, "rb").read()
    f = exr_py.ExrFile(data)
    # find the first chunk's rules block: after the 8-byte scanline
    # prefix and the 88-byte DWA header
    off = f._chunk_offsets[0]
    _, csize = struct.unpack_from("<ii", data, off)
    rules_off = off + 8 + 88
    (rule_size,) = struct.unpack_from("<H", data, rules_off)

    def mutate(fn):
        b = bytearray(data)
        fn(b)
        return bytes(b)

    cases = [
        # size field: zero, one, huge, just past the chunk
        mutate(lambda b: b.__setitem__(slice(rules_off, rules_off + 2),
                                       struct.pack("<H", 0))),
        mutate(lambda b: b.__setitem__(slice(rules_off, rules_off + 2),
                                       struct.pack("<H", 1))),
        mutate(lambda b: b.__setitem__(slice(rules_off, rules_off + 2),
                                       struct.pack("<H", 0xFFFF))),
        mutate(lambda b: b.__setitem__(slice(rules_off, rules_off + 2),
                                       struct.pack("<H", csize - 88))),
        # kill a suffix terminator (first NUL inside the block)
        mutate(lambda b: b.__setitem__(
            data.index(b"\0", rules_off + 2, rules_off + rule_size), 0x41)),
        # scheme bits out of range (value byte of the first rule)
        mutate(lambda b: b.__setitem__(
            data.index(b"\0", rules_off + 2) + 1, 0x0C)),
        # pixel-type byte out of range
        mutate(lambda b: b.__setitem__(
            data.index(b"\0", rules_off + 2) + 2, 0x7F)),
    ]
    for j, payload in enumerate(cases):
        with open(tmp_path / f"fuzz_rules_{j}.exr", "wb") as f2:
            f2.write(payload)
    child = _CHILD.replace("_read_channels_native", "read_exr_channels")
    for backend_env in ("python", "native"):
        if backend_env == "native" and _load_native() is None:
            continue
        env = dict(os.environ, PCSS_EXR_BACKEND=backend_env)
        p = subprocess.run(
            [sys.executable, "-c", child, str(tmp_path)],
            capture_output=True, text=True, timeout=300, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert p.returncode == 0 and "ALL_OK" in p.stdout, (
            f"{backend_env} decode crashed (rc={p.returncode}) on: "
            f"{p.stdout.strip().splitlines()[-1:] or '?'}\n{p.stderr[-400:]}")


def test_overlapping_and_short_chunks_rejected(tmp_path, rng):
    """Blocks that overlap (duplicate / unaligned y, duplicate tile) or lie
    about their size (COMP_NONE csize < line block) must be REJECTED, not
    decoded: the chunk-parallel pool's disjoint-writes precondition would
    otherwise become a C++ data race, and a short raw chunk an over-read.
    Both codecs must agree (serial Python would merely overwrite, but the
    differential contract keeps the validation identical)."""
    h, w = 24, 32
    chan = {"R": rng.standard_normal((h, w)).astype(np.float32)}

    def patched(src_path, patch_fn):
        data = bytearray(open(src_path, "rb").read())
        offs = exr_py.ExrFile(bytes(data))._chunk_offsets
        patch_fn(data, offs)
        p = str(tmp_path / f"bad_{patch_fn.__name__}.exr")
        with open(p, "wb") as f:
            f.write(data)
        return p

    zip_p = str(tmp_path / "zip.exr")
    write_exr(zip_p, chan, compression=exr_py.COMP_ZIP)  # lpc=16: 2 chunks
    tiled_p = str(tmp_path / "tiled.exr")
    write_exr(tiled_p, chan, compression=exr_py.COMP_ZIP,
              tile_size=(16, 16))  # 2x2 tiles
    none_p = str(tmp_path / "none.exr")
    write_exr(none_p, chan, compression=exr_py.COMP_NONE)

    def dup_y(b, offs):           # chunk 1 claims chunk 0's rows
        struct.pack_into("<i", b, offs[1], 0)

    def unaligned_y(b, offs):     # in range but off the 16-line grid
        struct.pack_into("<i", b, offs[1], 5)

    def dup_tile(b, offs):        # tile 1 replays tile 0's (dx, dy)
        struct.pack_into("<ii", b, offs[1], 0, 0)

    def short_none(b, offs):      # raw chunk shorter than its line block
        struct.pack_into("<i", b, offs[0] + 4, 8)

    # the insidious variant: a 2-channel NONE file truncated to EXACTLY the
    # first channel's row — reading only that channel would "succeed" off
    # the short buffer unless the codec validates the whole line block
    ab_p = str(tmp_path / "ab.exr")
    write_exr(ab_p, {"A": chan["R"], "B": chan["R"] + 1.0},
              compression=exr_py.COMP_NONE)

    def short_none_first_channel(b, offs):
        struct.pack_into("<i", b, offs[0] + 4, w * 4)

    cases = [(patched(zip_p, dup_y), ["R"]),
             (patched(zip_p, unaligned_y), ["R"]),
             (patched(tiled_p, dup_tile), ["R"]),
             (patched(none_p, short_none), ["R"]),
             (patched(ab_p, short_none_first_channel), ["A"])]
    from pcss_unet_tpu.io.exr import _read_channels_native
    for p, names in cases:
        with pytest.raises(Exception):
            exr_py.read_exr_channels_py(p, names)
        if _load_native() is not None:
            with pytest.raises(IOError):
                _read_channels_native(p, names)
