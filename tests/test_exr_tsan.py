"""ThreadSanitizer proof for the chunk-parallel decode worker pool
(native/exr/exr_codec.cpp read_channels + per-thread Scratch).

Builds the codec + native/exr/tsan_harness.cpp with -fsanitize=thread on
demand and decodes ZIP/PIZ/DWAA files on 4 threads; TSan aborts nonzero
on any data race (including unsynchronized lazy-init of the LUT/table
statics, which rely on C++11 magic statics).  Skips (never fails) when
the toolchain can't build TSan binaries.
"""

import os
import pathlib
import subprocess

import numpy as np
import pytest

from pcss_unet_tpu.io import exr_py

REPO = pathlib.Path(__file__).parent.parent
HARNESS_SRC = REPO / "native" / "exr" / "tsan_harness.cpp"
CODEC_SRC = REPO / "native" / "exr" / "exr_codec.cpp"


@pytest.fixture(scope="session")
def tsan_harness(tmp_path_factory):
    out = tmp_path_factory.mktemp("tsan") / "tsan_exr"
    r = subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=thread", "-std=c++17", "-pthread",
         "-o", str(out), str(HARNESS_SRC), str(CODEC_SRC), "-lz"],
        capture_output=True, text=True, timeout=300)
    if r.returncode != 0 or not out.exists():
        pytest.skip(f"TSan build unavailable: {r.stderr[-300:]}")
    return str(out)


@pytest.mark.parametrize("comp", [exr_py.COMP_ZIP, exr_py.COMP_PIZ,
                                  exr_py.COMP_DWAA])
def test_threaded_decode_race_free(tsan_harness, tmp_path, comp):
    h, w = 300, 400
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(0)
    planes = {"R": (0.5 + 0.4 * np.sin(xx / 9) * np.cos(yy / 7)).astype(np.float32),
              "G": rng.random((h, w)).astype(np.float32),
              "B": (rng.random((h, w)) > 0.6).astype(np.float32),
              "A": np.ones((h, w), np.float32)}
    path = str(tmp_path / "f.exr")
    exr_py.write_exr_py(path, planes, compression=comp)
    r = subprocess.run([tsan_harness, path], capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, f"TSan reported:\n{r.stderr[-2000:]}"
    assert "tsan harness ok" in r.stdout
