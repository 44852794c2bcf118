"""EXR files with non-zero dataWindow origins (renderers commonly emit
offset windows) must decode identically in both backends."""

import struct

import numpy as np
import pytest

from pcss_unet_tpu.io import exr_py
from pcss_unet_tpu.io.exr import _load_native, read_exr_channels


def _shift_data_window(path: str, dy: int, dx: int) -> None:
    """Binary-patch a (0,0)-origin file written by our codec into one with
    dataWindow mins (dx, dy): rewrite the box2i attrs and each chunk's y."""
    with open(path, "rb") as f:
        blob = bytearray(f.read())
    # walk the header to find dataWindow/displayWindow payload offsets
    pos = 8
    boxes = []
    while True:
        end = blob.index(b"\x00", pos)
        name = bytes(blob[pos:end]).decode()
        pos = end + 1
        if not name:
            break
        end = blob.index(b"\x00", pos)
        pos = end + 1
        size = struct.unpack_from("<i", blob, pos)[0]
        pos += 4
        if name in ("dataWindow", "displayWindow"):
            boxes.append(pos)
        pos += size
    assert boxes
    for off in boxes:
        x0, y0, x1, y1 = struct.unpack_from("<4i", blob, off)
        struct.pack_into("<4i", blob, off, x0 + dx, y0 + dy, x1 + dx, y1 + dy)
    # offset table follows the header; then chunks [y:int32, size:int32, data]
    parsed = exr_py.ExrFile(bytes(open(path, "rb").read()))
    for chunk_off in parsed._chunk_offsets:
        y = struct.unpack_from("<i", blob, chunk_off)[0]
        struct.pack_into("<i", blob, chunk_off, y + dy)
    with open(path, "wb") as f:
        f.write(blob)


@pytest.mark.parametrize("comp", [exr_py.COMP_NONE, exr_py.COMP_ZIP])
def test_offset_data_window(tmp_path, rng, comp):
    h, w = 21, 33
    chans = {n: rng.standard_normal((h, w)).astype(np.float32)
             for n in ("G", "R")}
    path = str(tmp_path / "o.exr")
    exr_py.write_exr_py(path, chans, compression=comp)
    _shift_data_window(path, dy=7, dx=5)

    out_py = exr_py.read_exr_channels_py(path, ["R", "G"])
    for n in chans:
        np.testing.assert_array_equal(out_py[n], chans[n])

    if _load_native() is not None:
        import os

        os.environ["PCSS_EXR_BACKEND"] = "native"
        try:
            out_nat = read_exr_channels(path, ["R", "G"])
        finally:
            os.environ.pop("PCSS_EXR_BACKEND")
        for n in chans:
            np.testing.assert_array_equal(out_nat[n], chans[n])
