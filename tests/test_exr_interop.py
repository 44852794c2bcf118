"""Interop validation against the REAL libOpenEXR (system package 3.1.x),
via the tests/oracle/exr_oracle CLI.

The reference pipeline consumes EXRs through the OpenEXR bindings
(setdata.py:42), so the binding-level contract this repo must honor is
bidirectional:

- files written by libOpenEXR (any compression, tiled or scanline, any
  part layout) decode HERE to exactly what libOpenEXR itself decodes;
- files written HERE decode in libOpenEXR to exactly the data we wrote.

Until this round both codecs were validated only by roundtrip +
cross-codec differential tests ("from-spec, self-consistent"); these
tests pin them to upstream bytes.  Skips (never fails) when the oracle
can't build — the system OpenEXR dev package is the build dependency.
"""

import os
import pathlib
import subprocess

import numpy as np
import pytest

from pcss_unet_tpu.io import exr_py
from pcss_unet_tpu.io.exr import (
    COMP_NONE, COMP_ZIP, PT_FLOAT, PT_HALF, _load_native,
    read_exr_channels, write_exr, write_exr_multipart,
)

ORACLE_DIR = pathlib.Path(__file__).parent / "oracle"
ORACLE = ORACLE_DIR / "exr_oracle"

COMP_NAMES = ["none", "rle", "zips", "zip", "piz", "pxr24", "b44", "b44a",
              "dwaa", "dwab"]
COMP_IDS = {n: i for i, n in enumerate(COMP_NAMES)}
LOSSLESS = {"none", "rle", "zips", "zip", "piz"}


@pytest.fixture(scope="session")
def oracle():
    if not ORACLE.exists():
        r = subprocess.run(["make", "-C", str(ORACLE_DIR)],
                           capture_output=True, text=True)
        if r.returncode != 0 or not ORACLE.exists():
            pytest.skip(f"libOpenEXR oracle unavailable: {r.stderr[-500:]}")
    return str(ORACLE)


@pytest.fixture(params=["python", "native"])
def backend(request, monkeypatch):
    if request.param == "native" and _load_native() is None:
        pytest.skip("native EXR codec unavailable")
    monkeypatch.setenv("PCSS_EXR_BACKEND", request.param)
    return request.param


def oracle_write(oracle, path, comp, data, spec, tmp_path, *extra):
    """data: [C, H, W] float32, planes in ``spec`` order."""
    _, h, w = data.shape
    bin_path = str(tmp_path / "data.bin")
    np.ascontiguousarray(data).tofile(bin_path)
    subprocess.run([oracle, "write", path, comp, str(w), str(h), spec,
                    bin_path, *map(str, extra)], check=True,
                   capture_output=True, text=True)


def oracle_dump(oracle, path, tmp_path, part=None):
    """→ ({name: [H, W] float32}, [name:type ...] in chlist order)."""
    bin_path = str(tmp_path / "dump.bin")
    cmd = [oracle, "dump", path, bin_path]
    if part is not None:
        cmd += ["--part", str(part)]
    r = subprocess.run(cmd, check=True, capture_output=True, text=True)
    fields = r.stdout.split()
    w, h = int(fields[0]), int(fields[1])
    names = [f.split(":")[0] for f in fields[2:]]
    data = np.fromfile(bin_path, np.float32).reshape(len(names), h, w)
    return {n: data[i] for i, n in enumerate(names)}, fields[2:]


def mixed_data(rng, h, w):
    """R/G/B/A half + Z float + id uint — the channel-type mix a renderer
    dump carries.  Half planes pre-quantized so lossless paths compare
    exactly; smooth + noise so DCT schemes see realistic content."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    smooth = 0.5 + 0.4 * np.cos(xx / 9.0) * np.sin(yy / 7.0)
    planes = {
        "R": smooth + 0.05 * rng.standard_normal((h, w)),
        "G": smooth * 0.8 + 0.02 * rng.standard_normal((h, w)),
        "B": smooth * 0.3 + 0.08 * rng.standard_normal((h, w)),
        "A": (rng.random((h, w)) > 0.2).astype(np.float32),
        "Z": rng.uniform(0.1, 100.0, (h, w)),
        "id": rng.integers(0, 4096, (h, w)),
    }
    spec = "R:half,G:half,B:half,A:half,Z:float,id:uint"
    out = []
    for item in spec.split(","):
        n, t = item.split(":")
        p = planes[n].astype(np.float32)
        if t == "half":
            p = p.astype(np.float16).astype(np.float32)
        out.append(p)
    return np.stack(out), spec


def assert_matches_oracle(ours, ref, comp, context):
    assert ours is not None, f"{context}: channel missing"
    if comp in ("dwaa", "dwab"):
        # decode of the same bytes through two float IDCT/CSC pipelines
        # (upstream's SIMD butterflies vs our einsum) — results differ by
        # a few half-ulps before the final half rounding.  Dense
        # coefficient streams (our tighter quantizer) show up to ~3 ulps;
        # upstream's sparse level-45 streams stay within 1.
        np.testing.assert_allclose(ours, ref, atol=8e-3, rtol=8e-3,
                                   err_msg=context)
    else:
        np.testing.assert_array_equal(ours, ref, err_msg=context)


@pytest.mark.parametrize("comp", COMP_NAMES)
@pytest.mark.parametrize("size", [(37, 53), (64, 96)],
                         ids=["odd", "aligned"])
def test_decode_what_openexr_writes(tmp_path, oracle, backend, comp, size):
    """Scanline files written by real libOpenEXR decode here to exactly
    what libOpenEXR itself decodes (the setdata.py:42 read path)."""
    h, w = size
    rng = np.random.default_rng(COMP_IDS[comp] * 100 + h)
    data, spec = mixed_data(rng, h, w)
    path = str(tmp_path / "o.exr")
    oracle_write(oracle, path, comp, data, spec, tmp_path)
    ref, _ = oracle_dump(oracle, path, tmp_path)
    names = [s.split(":")[0] for s in spec.split(",")]
    ours = read_exr_channels(path, names)
    for i, n in enumerate(names):
        assert_matches_oracle(ours[n], ref[n], comp, f"{comp}/{n}")
        if comp in LOSSLESS:
            np.testing.assert_array_equal(ref[n], data[i],
                                          err_msg=f"oracle {comp}/{n}")


@pytest.mark.parametrize("comp", COMP_NAMES)
def test_openexr_reads_what_we_write(tmp_path, oracle, backend, comp):
    """Files written by this repo's codecs decode in real libOpenEXR to
    the data we wrote — the producer-side interop guarantee."""
    h, w = 37, 53
    rng = np.random.default_rng(COMP_IDS[comp])
    chans = {n: rng.standard_normal((h, w)).astype(np.float32)
             for n in ("R", "G", "B", "A")}
    if comp in ("b44", "b44a", "dwaa", "dwab"):
        # half-data schemes: keep values in half range, pre-quantized
        chans = {n: np.abs(v.astype(np.float16).astype(np.float32))
                 for n, v in chans.items()}
    path = str(tmp_path / "m.exr")
    pt = PT_HALF if comp in ("b44", "b44a", "dwaa", "dwab") else PT_FLOAT
    write_exr(path, chans, compression=COMP_IDS[comp], pixel_type=pt)
    ref, _ = oracle_dump(oracle, path, tmp_path)
    ours = read_exr_channels(path, list(chans))
    for n, v in chans.items():
        if comp in LOSSLESS and pt == PT_FLOAT:
            np.testing.assert_array_equal(ref[n], v, err_msg=f"{comp}/{n}")
        else:
            # lossy or half: libOpenEXR must agree with OUR decode of the
            # same bytes
            assert_matches_oracle(ours[n], ref[n], comp, f"{comp}/{n}")


@pytest.mark.parametrize("mode,rnd", [("one", "down"), ("mip", "down"),
                                      ("mip", "up"), ("rip", "down")])
def test_decode_openexr_tiled(tmp_path, oracle, backend, mode, rnd):
    """Tiled files (incl. mip/rip pyramids) from libOpenEXR: the level-0
    plane decodes identically (the plane the reference bindings expose)."""
    h, w = 45, 70
    rng = np.random.default_rng(7)
    data, spec = mixed_data(rng, h, w)
    names = [s.split(":")[0] for s in spec.split(",")]
    path = str(tmp_path / "t.exr")
    oracle_write(oracle, path, "zip", data, spec, tmp_path,
                 "--tiled", 16, 12, mode, rnd)
    ref, _ = oracle_dump(oracle, path, tmp_path)
    ours = read_exr_channels(path, names)
    for n in names:
        np.testing.assert_array_equal(ours[n], ref[n],
                                      err_msg=f"{mode}/{rnd}/{n}")


def test_decode_openexr_multipart(tmp_path, oracle, backend):
    h, w = 33, 41
    rng = np.random.default_rng(3)
    d0, spec = mixed_data(rng, h, w)
    d1, _ = mixed_data(rng, h, w)
    names = [s.split(":")[0] for s in spec.split(",")]
    path = str(tmp_path / "mp.exr")
    oracle_write(oracle, path, "piz", np.concatenate([d0, d1]), spec,
                 tmp_path, "--parts", 2)
    for p in (0, 1):
        ref, _ = oracle_dump(oracle, path, tmp_path, part=p)
        ours = read_exr_channels(path, names, part=p)
        for n in names:
            np.testing.assert_array_equal(ours[n], ref[n],
                                          err_msg=f"part{p}/{n}")
    # by-name selection matches by-index
    by_name = read_exr_channels(path, names, part="part1")
    ref1, _ = oracle_dump(oracle, path, tmp_path, part=1)
    for n in names:
        np.testing.assert_array_equal(by_name[n], ref1[n])


def test_openexr_reads_our_multipart(tmp_path, oracle, backend):
    h, w = 21, 30
    rng = np.random.default_rng(5)
    parts = [("first", {"R": rng.standard_normal((h, w)).astype(np.float32)}),
             ("second", {"R": rng.standard_normal((h, w)).astype(np.float32),
                         "Z": rng.standard_normal((h, w)).astype(np.float32)})]
    path = str(tmp_path / "omp.exr")
    write_exr_multipart(path, parts, compression=COMP_ZIP,
                        pixel_type=PT_FLOAT)
    for p, (_, chans) in enumerate(parts):
        ref, _ = oracle_dump(oracle, path, tmp_path, part=p)
        for n, v in chans.items():
            np.testing.assert_array_equal(ref[n], v, err_msg=f"part{p}/{n}")


def test_openexr_reads_our_tiled(tmp_path, oracle, backend):
    h, w = 45, 70
    rng = np.random.default_rng(11)
    chans = {n: rng.standard_normal((h, w)).astype(np.float32)
             for n in ("R", "G")}
    path = str(tmp_path / "ot.exr")
    write_exr(path, chans, compression=COMP_ZIP, pixel_type=PT_FLOAT,
              tile_size=(16, 12))
    ref, _ = oracle_dump(oracle, path, tmp_path)
    for n, v in chans.items():
        np.testing.assert_array_equal(ref[n], v, err_msg=n)


@pytest.mark.parametrize("comp", ["zip", "piz"])
def test_decode_openexr_data_window_offset(tmp_path, oracle, backend, comp):
    """Files whose data window doesn't start at (0,0) — crop renders."""
    h, w = 25, 35
    rng = np.random.default_rng(13)
    data, spec = mixed_data(rng, h, w)
    names = [s.split(":")[0] for s in spec.split(",")]
    path = str(tmp_path / "dw.exr")
    oracle_write(oracle, path, comp, data, spec, tmp_path, "--dw", 100, 200)
    ref, _ = oracle_dump(oracle, path, tmp_path)
    ours = read_exr_channels(path, names)
    for n in names:
        np.testing.assert_array_equal(ours[n], ref[n], err_msg=n)


def test_decode_openexr_decreasing_y(tmp_path, oracle, backend):
    h, w = 29, 31
    rng = np.random.default_rng(17)
    data, spec = mixed_data(rng, h, w)
    names = [s.split(":")[0] for s in spec.split(",")]
    path = str(tmp_path / "dy.exr")
    oracle_write(oracle, path, "zip", data, spec, tmp_path, "--decreasing")
    ref, _ = oracle_dump(oracle, path, tmp_path)
    ours = read_exr_channels(path, names)
    for n in names:
        np.testing.assert_array_equal(ours[n], ref[n], err_msg=n)


@pytest.mark.parametrize("comp", ["dwaa", "dwab"])
def test_decode_openexr_dwa_levels(tmp_path, oracle, backend, comp):
    """DWA files at non-default compression levels (the level changes the
    quantization error budget baked into the stream)."""
    h, w = 40, 64
    rng = np.random.default_rng(19)
    data, spec = mixed_data(rng, h, w)
    names = [s.split(":")[0] for s in spec.split(",")]
    for level in (0.0, 45.0, 200.0):
        path = str(tmp_path / f"l{int(level)}.exr")
        oracle_write(oracle, path, comp, data, spec, tmp_path,
                     "--level", level)
        ref, _ = oracle_dump(oracle, path, tmp_path)
        ours = read_exr_channels(path, names)
        for n in names:
            assert_matches_oracle(ours[n], ref[n], comp,
                                  f"{comp}/level{level}/{n}")


def test_dwa_size_parity_with_openexr(tmp_path, oracle, backend):
    """At the same dwaCompressionLevel our DWA files land at (or better
    than) libOpenEXR's size/loss point: the per-frequency quantization
    budgets (_QUANT_W_Y/_QUANT_W_CBCR) were extracted from the library,
    so the zeroing behavior matches.  Guard: ≤1.15× upstream's size AND
    PSNR within 2 dB of upstream on smooth render-like content."""
    h, w = 256, 256
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def mk(p):
        return (0.5 + 0.4 * np.sin(xx / 9 + p) * np.cos(yy / 7 + p)
                + 0.01 * rng.standard_normal((h, w)).astype(np.float32))

    chans = {"R": mk(0), "G": mk(1), "B": mk(2),
             "A": np.ones((h, w), np.float32)}
    data = np.stack([chans[n].astype(np.float16).astype(np.float32)
                     for n in ("R", "G", "B", "A")])
    ref_path = str(tmp_path / "up.exr")
    oracle_write(oracle, ref_path, "dwaa", data,
                 "R:half,G:half,B:half,A:half", tmp_path)
    our_path = str(tmp_path / "ours.exr")
    write_exr(our_path, chans, compression=8, pixel_type=PT_HALF)

    def psnr(path):
        out = read_exr_channels(path, ["R", "G", "B"])
        mses = [float(np.mean((out[n] - chans[n].astype(np.float16)
                               .astype(np.float32)) ** 2))
                for n in ("R", "G", "B")]
        return 10 * np.log10(1.0 / max(np.mean(mses), 1e-12))

    size_ratio = os.path.getsize(our_path) / os.path.getsize(ref_path)
    assert size_ratio < 1.15, f"our DWA file {size_ratio:.2f}x upstream's"
    assert psnr(our_path) > psnr(ref_path) - 2.0


def test_dwa_case_sensitive_rules(tmp_path, oracle, backend):
    """libOpenEXR's default DWA rules match case-SENSITIVELY (the
    serialized value byte's bit0 is a case-INSENSITIVE flag, 0 in the
    defaults): a lowercase 'r:half' channel classifies UNKNOWN upstream,
    not LOSSY_DCT.  Both directions must agree on a file carrying 'R'
    and 'r' — the exact case a case-folding classifier mis-indexes."""
    h, w = 37, 53
    rng = np.random.default_rng(21)
    smooth = mixed_data(rng, h, w)[0][0]
    upper = smooth
    lowr = (smooth * 0.5 + 0.01).astype(np.float16).astype(np.float32)
    path = str(tmp_path / "case.exr")
    oracle_write(oracle, path, "dwaa", np.stack([upper, lowr]),
                 "R:half,r:half", tmp_path)
    ref, _ = oracle_dump(oracle, path, tmp_path)
    ours = read_exr_channels(path, ["R", "r"])
    assert_matches_oracle(ours["R"], ref["R"], "dwaa", "case/R")
    # 'r' is UNKNOWN upstream -> lossless at half: bit-exact
    np.testing.assert_array_equal(ours["r"], ref["r"], err_msg="case/r")
    np.testing.assert_array_equal(ours["r"], lowr)

    # reverse: our encoder must classify 'r' UNKNOWN too, so libOpenEXR
    # reads our file
    chans = {"R": upper, "r": lowr}
    our_path = str(tmp_path / "case_ours.exr")
    write_exr(our_path, chans, compression=COMP_IDS["dwaa"],
              pixel_type=PT_HALF)
    ref2, _ = oracle_dump(oracle, our_path, tmp_path)
    np.testing.assert_array_equal(ref2["r"], lowr)
