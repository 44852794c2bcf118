"""EXR reading/writing — public API of the IO layer.

``read_exr`` reproduces the reference's channel contract exactly
(setdata.py:34-110): returns the four float32 [H, W] planes R, G, B, A; a
missing A channel is synthesized as all-ones (setdata.py:64-67); non-finite
values are scrubbed nan→0, +inf→1, −inf→0 (setdata.py:81-83).

Backend selection: the native C++ codec (native/exr/exr_codec.cpp, built
on demand to ``native/exr/libpcss_exr.so``) when available — every call
releases the GIL for the full decode so the data-prep layer parallelizes
across files with plain threads — else the pure-Python codec
(io/exr_py.py).  Set ``PCSS_EXR_BACKEND=python|native`` to force one.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Sequence

import numpy as np

from pcss_unet_tpu.io import exr_py

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native", "exr")
_NATIVE_SO = os.path.join(_NATIVE_DIR, "libpcss_exr.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False

COMP_NONE = exr_py.COMP_NONE
COMP_RLE = exr_py.COMP_RLE
COMP_ZIPS = exr_py.COMP_ZIPS
COMP_ZIP = exr_py.COMP_ZIP
COMP_PXR24 = exr_py.COMP_PXR24
PT_HALF = exr_py.PT_HALF
PT_FLOAT = exr_py.PT_FLOAT


def _load_native():
    """Load (building if necessary) the native codec; None on any failure."""
    global _lib, _build_attempted
    if os.environ.get("PCSS_EXR_BACKEND") == "python":
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_NATIVE_SO) and not _build_attempted:
            _build_attempted = True
            src = os.path.join(_NATIVE_DIR, "exr_codec.cpp")
            if os.path.exists(src):
                try:
                    subprocess.run(
                        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                         "-pthread", "-o", _NATIVE_SO, src, "-lz"],
                        check=True, capture_output=True, timeout=120)
                    logging.info("built native EXR codec at %s", _NATIVE_SO)
                except Exception as e:  # noqa: BLE001 - fall back to python codec
                    logging.warning("native EXR codec build failed (%s); "
                                    "using pure-Python codec", e)
                    return None
        if not os.path.exists(_NATIVE_SO):
            return None
        try:
            lib = ctypes.CDLL(_NATIVE_SO)
        except OSError as e:
            logging.warning("cannot load %s (%s); using pure-Python codec",
                            _NATIVE_SO, e)
            return None
        lib.pcss_exr_open_file.restype = ctypes.c_void_p
        lib.pcss_exr_open_file.argtypes = [ctypes.c_char_p]
        if hasattr(lib, "pcss_exr_open_file_part"):
            lib.pcss_exr_open_file_part.restype = ctypes.c_void_p
            lib.pcss_exr_open_file_part.argtypes = [ctypes.c_char_p,
                                                    ctypes.c_int]
            lib.pcss_exr_num_parts.restype = ctypes.c_int
            lib.pcss_exr_num_parts.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "pcss_exr_open_file_named"):
            lib.pcss_exr_open_file_named.restype = ctypes.c_void_p
            lib.pcss_exr_open_file_named.argtypes = [ctypes.c_char_p,
                                                     ctypes.c_char_p]
            lib.pcss_exr_part_name.restype = ctypes.c_int
            lib.pcss_exr_part_name.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                               ctypes.c_char_p, ctypes.c_int]
        if hasattr(lib, "pcss_exr_write_multipart"):
            lib.pcss_exr_write_multipart.restype = ctypes.c_int
            lib.pcss_exr_write_multipart.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.pcss_exr_dims.restype = ctypes.c_int
        lib.pcss_exr_dims.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        lib.pcss_exr_num_channels.restype = ctypes.c_int
        lib.pcss_exr_num_channels.argtypes = [ctypes.c_void_p]
        lib.pcss_exr_channel_name.restype = ctypes.c_int
        lib.pcss_exr_channel_name.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                              ctypes.c_char_p, ctypes.c_int]
        lib.pcss_exr_read_channel.restype = ctypes.c_int
        lib.pcss_exr_read_channel.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                              ctypes.POINTER(ctypes.c_float)]
        if hasattr(lib, "pcss_exr_read_channels"):
            lib.pcss_exr_read_channels.restype = ctypes.c_int
            lib.pcss_exr_read_channels.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.pcss_exr_error.restype = ctypes.c_char_p
        lib.pcss_exr_error.argtypes = [ctypes.c_void_p]
        lib.pcss_exr_close.restype = None
        lib.pcss_exr_close.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "pcss_exr_set_threads"):
            lib.pcss_exr_set_threads.restype = None
            lib.pcss_exr_set_threads.argtypes = [ctypes.c_int]
        lib.pcss_exr_write.restype = ctypes.c_int
        lib.pcss_exr_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        if hasattr(lib, "pcss_exr_write_tiled"):
            lib.pcss_exr_write_tiled.restype = ctypes.c_int
            lib.pcss_exr_write_tiled.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def set_decode_threads(n: int) -> bool:
    """Set the native codec's within-file chunk-parallel decode width.

    ``n > 1``: decode each file's chunks on ``n`` threads; ``n == 0``: use
    the hardware thread count; ``n == 1``: serial (the default).  The
    effective width is capped at 16 threads per file (and at the file's
    chunk count) — past that the marginal chunk-level win is a few percent
    while the pool spawn cost is paid per decode.  Chunks
    write to disjoint plane regions so results are identical at any width.
    File-level parallelism (threads over many files, the training-pipeline
    pattern) composes poorly with this — it is meant for single-file
    latency, e.g. the one-EXR inference CLI where a 1080p DWAA decode
    costs ~10x the jitted forward pass.  Also settable before first use
    via the PCSS_EXR_THREADS env var.  Returns False when the native
    codec (or a new enough build of it) is unavailable.
    """
    lib = _load_native()
    if lib is None or not hasattr(lib, "pcss_exr_set_threads"):
        return False
    lib.pcss_exr_set_threads(int(n))
    return True


def _read_channels_native(path: str, names: Sequence[str],
                          part: int | str = 0):
    lib = _load_native()
    if lib is None:
        return None
    if isinstance(part, str):
        if not hasattr(lib, "pcss_exr_open_file_named"):
            return None  # pre-named-part .so
        # by-NAME selection resolves inside ONE native open/read
        handle = lib.pcss_exr_open_file_named(path.encode(), part.encode())
    elif part:
        if not hasattr(lib, "pcss_exr_open_file_part"):
            return None  # pre-multi-part .so
        handle = lib.pcss_exr_open_file_part(path.encode(), part)
    else:
        handle = lib.pcss_exr_open_file(path.encode())
    try:
        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.pcss_exr_dims(handle, ctypes.byref(w), ctypes.byref(h)) != 0:
            raise IOError(f"EXR parse error in {path}: "
                          f"{lib.pcss_exr_error(handle).decode()}")
        out: dict[str, np.ndarray | None] = {}
        bufs = [np.empty((h.value, w.value), np.float32) for _ in names]
        if hasattr(lib, "pcss_exr_read_channels"):
            # one pass over the chunks for ALL channels: decompression
            # (inflate/Huffman/DCT) runs once, not once per channel
            n = len(names)
            name_arr = (ctypes.c_char_p * n)(*[s.encode() for s in names])
            ptr_arr = (ctypes.POINTER(ctypes.c_float) * n)(
                *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                  for b in bufs])
            present = (ctypes.c_int * n)()
            if lib.pcss_exr_read_channels(handle, name_arr, ptr_arr, n,
                                          present) != 0:
                raise IOError(f"EXR decode error in {path}: "
                              f"{lib.pcss_exr_error(handle).decode()}")
            for i, name in enumerate(names):
                out[name] = bufs[i] if present[i] else None
            return out
        for name, buf in zip(names, bufs):  # pre-multi-read .so
            rc = lib.pcss_exr_read_channel(
                handle, name.encode(),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc == 1:
                out[name] = buf
            elif rc == 0:
                out[name] = None
            else:
                raise IOError(f"EXR decode error in {path}: "
                              f"{lib.pcss_exr_error(handle).decode()}")
        return out
    finally:
        lib.pcss_exr_close(handle)


def write_exr_multipart(path: str,
                        parts: list[tuple[str, dict[str, np.ndarray]]],
                        compression: int = COMP_ZIP,
                        pixel_type: int = PT_FLOAT,
                        tile_size: tuple[int, int] | None = None) -> None:
    """Write a multi-part EXR (``parts``: ordered (name, channels) pairs).
    Native codec when available (``pcss_exr_write_multipart``), Python
    twin as fallback and oracle."""
    lib = (_load_native()
           if os.environ.get("PCSS_EXR_BACKEND") != "python" else None)
    if lib is not None and hasattr(lib, "pcss_exr_write_multipart"):
        part_names = [n for n, _ in parts]
        chan_names: list[str] = []
        arrs: list[np.ndarray] = []
        n_chans = []
        widths, heights = [], []
        for _, channels in parts:
            names = sorted(channels)
            n_chans.append(len(names))
            h, w = np.asarray(channels[names[0]]).shape
            heights.append(h)
            widths.append(w)
            for cn in names:
                chan_names.append(cn)
                arrs.append(np.ascontiguousarray(
                    np.asarray(channels[cn], np.float32)))
        pn_arr = (ctypes.c_char_p * len(parts))(
            *[s.encode() for s in part_names])
        nc_arr = (ctypes.c_int * len(parts))(*n_chans)
        w_arr = (ctypes.c_int * len(parts))(*widths)
        h_arr = (ctypes.c_int * len(parts))(*heights)
        cn_arr = (ctypes.c_char_p * len(chan_names))(
            *[s.encode() for s in chan_names])
        ptr_arr = (ctypes.POINTER(ctypes.c_float) * len(arrs))(
            *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
              for a in arrs])
        tw, th = (0, 0) if tile_size is None else (int(tile_size[0]),
                                                   int(tile_size[1]))
        rc = lib.pcss_exr_write_multipart(
            path.encode(), pn_arr, len(parts), nc_arr, cn_arr, ptr_arr,
            w_arr, h_arr, compression, pixel_type, tw, th)
        if rc == 0:
            return
        logging.warning("native multi-part EXR write failed (rc=%d); "
                        "using python codec", rc)
    exr_py.write_exr_multipart_py(path, parts, compression=compression,
                                  pixel_type=pixel_type,
                                  tile_size=tile_size)


def list_exr_channels(path: str, part: int | str = 0) -> list[str]:
    """Channel names in file (chlist) order — the reference inspects the
    header channel list through ``OpenEXR.InputFile(...).header()``
    (test.py:8-14, 40-43).  Uses the Python parser for both backends; the
    file is read once but no pixel decode happens (QA-tool path)."""
    if not os.path.exists(path):
        raise IOError(f"EXR file does not exist: {path}")
    with open(path, "rb") as f:
        return [c.name for c in exr_py.ExrFile(f.read(), part=part).channels]


def read_exr_channels(path: str, names: Sequence[str],
                      part: int | str = 0) -> dict:
    """Raw channel access: {name: float32 [H,W] or None if absent}.

    ``part`` selects a part of a multi-part file by index or name
    (default 0, which is also what the reference's ``OpenEXR.InputFile``
    exposes — setdata.py:42).  The native codec resolves index OR name
    inside one open (``pcss_exr_open_file_named``) — a single file read
    either way."""
    if not os.path.exists(path):
        raise IOError(f"EXR file does not exist: {path}")
    if os.environ.get("PCSS_EXR_BACKEND") != "python":
        try:
            result = _read_channels_native(path, names, part=part)
        except IOError as e:
            # fall back for files the native codec rejects (the pure-Python
            # twin may still support them, or give a clearer error)
            logging.debug("native EXR decode failed (%s); trying python", e)
            result = None
        if result is not None:
            return result
    return exr_py.read_exr_channels_py(path, list(names), part=part)


def read_exr(path: str) -> list[np.ndarray]:
    """Reference-contract reader (setdata.py:34-110): R, G, B, A float32
    planes; missing A → ones; non-finite → nan_to_num(0, 1, 0)."""
    chans = read_exr_channels(path, ["R", "G", "B", "A"])
    out = []
    shape = None
    for name in ["R", "G", "B", "A"]:
        arr = chans[name]
        if arr is not None and shape is None:
            shape = arr.shape
    if shape is None:
        raise ValueError(f"no R/G/B/A channels in {path}")
    for name in ["R", "G", "B", "A"]:
        arr = chans[name]
        if arr is None:
            if name == "A":
                arr = np.ones(shape, np.float32)  # setdata.py:64-67
            else:
                raise ValueError(f"channel {name} missing in {path}")
        if not np.isfinite(arr).all():
            arr = np.nan_to_num(arr, nan=0.0, posinf=1.0, neginf=0.0)
        out.append(arr)
    return out


def read_exr_stack(path: str) -> np.ndarray:
    """Convenience: [H, W, 4] float32 stack (NHWC-friendly)."""
    return np.stack(read_exr(path), axis=-1)


def write_exr(path: str, channels: dict[str, np.ndarray],
              compression: int | str = COMP_ZIP, pixel_type: int = PT_FLOAT,
              tile_size: tuple[int, int] | None = None) -> None:
    """Write a single-part EXR — scanline by default, ONE_LEVEL tiled when
    ``tile_size=(tile_w, tile_h)``.  Channel dict keys are sorted (EXR
    requires an alphabetical chlist).  ``compression`` accepts the COMP_*
    code or the scheme name ("ZIP", "DWAA", "piz", ...)."""
    if isinstance(compression, str):
        try:
            compression = getattr(exr_py, f"COMP_{compression.upper()}")
        except AttributeError:
            raise ValueError(f"unknown compression {compression!r}") from None
    lib = _load_native() if os.environ.get("PCSS_EXR_BACKEND") != "python" else None
    names = sorted(channels)
    if lib is not None and (tile_size is None
                            or hasattr(lib, "pcss_exr_write_tiled")):
        arrs = [np.ascontiguousarray(np.asarray(channels[n], np.float32))
                for n in names]
        h, w = arrs[0].shape
        name_arr = (ctypes.c_char_p * len(names))(*[n.encode() for n in names])
        ptr_arr = (ctypes.POINTER(ctypes.c_float) * len(names))(
            *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrs])
        if tile_size is None:
            rc = lib.pcss_exr_write(path.encode(), name_arr, ptr_arr,
                                    len(names), w, h, compression, pixel_type)
        else:
            rc = lib.pcss_exr_write_tiled(
                path.encode(), name_arr, ptr_arr, len(names), w, h,
                compression, pixel_type, int(tile_size[0]), int(tile_size[1]))
        if rc == 0:
            return
        logging.warning("native EXR write failed (rc=%d); using python codec", rc)
    exr_py.write_exr_py(path, channels, compression=compression,
                        pixel_type=pixel_type, tile_size=tile_size)
