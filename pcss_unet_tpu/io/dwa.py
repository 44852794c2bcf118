"""DWA (DWAA/DWAB) EXR compression — pure-numpy implementation.

The reference reads EXRs through the OpenEXR bindings (setdata.py:42),
which accept DWA-compressed files transparently; DWAA is a common modern
renderer default.  This module implements the DWA scheme from the OpenEXR
file-format specification for the pure-Python codec (io/exr_py.py), with
the same from-the-spec discipline as io/piz.py:

- chunk layout: an 11×uint64 header (version, per-segment compressed /
  uncompressed sizes, AC/DC counts, AC-compression selector) followed by
  the UNKNOWN / AC / DC / RLE segments;
- channel classification (default rules): HALF channels suffixed
  R/G/B/Y/BY/RY → LOSSY_DCT (R,G,B triples sharing a prefix form a CSC
  set converted through Rec.709 Y'CbCr; all are coded through the
  perceptual nonlinearity), HALF A → RLE, everything else (incl. all
  FLOAT/UINT channels) → UNKNOWN, stored losslessly via deflate;
- LOSSY_DCT: 8×8 orthonormal DCT per block on the nonlinearized plane,
  error-budgeted quantization to sparse halfs, zig-zag traversal, DC
  coefficients split into their own segment (reorder+delta+deflate — the
  ZIP transform), AC coefficients zero-run-length coded
  (token 0xff00|run) and entropy-coded with the PIZ Huffman coder;
- RLE scheme: planar byte split of the half data, EXR RLE, deflate.

Files are written with header version 1 (default channel rules — the
spec's pre-rules version, which every decoder must accept); version-2
inputs are readable: their serialized channel-rules block is skipped and
the default rules applied.  Fidelity is validated by synthetic roundtrip
and cross-posture tests (tests/test_exr.py) — this environment has no
libopenexr to produce external fixtures, so byte-level compatibility
with upstream encoders is asserted at the container level only; inputs
using non-default channel rules decode with default classification.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# AC compression selectors (header word 10)
AC_STATIC_HUFFMAN = 0
AC_DEFLATE = 1

# classification schemes
_UNKNOWN, _LOSSY_DCT, _RLE = 0, 1, 2

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int64)

# orthonormal 8-point DCT-II basis
_DCT_C = np.empty((8, 8), np.float32)
for _k in range(8):
    _s = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    _DCT_C[_k] = _s * np.cos(np.pi * (2 * np.arange(8) + 1) * _k / 16.0)

# per-zigzag-index quantization error weights (JPEG-style ramp; encoder-
# side freedom — any half value is legal in the stream)
_QUANT_W = 1.0 + np.arange(64, dtype=np.float32) * 0.35


def _lut_nonlinear() -> tuple[np.ndarray, np.ndarray]:
    """(to_nonlinear, to_linear) LUTs over all 65536 half bit patterns:
    the perceptual x^(1/2.2) transfer (sign-preserving; NaN/Inf pass)."""
    bits = np.arange(65536, dtype=np.uint16)
    f = bits.view(np.float16).astype(np.float32)
    with np.errstate(invalid="ignore", over="ignore"):
        nl = np.sign(f) * np.abs(f) ** (1.0 / 2.2)
        lin = np.sign(f) * np.abs(f) ** 2.2
        keep = ~np.isfinite(f)
        nl[keep] = f[keep]
        lin[keep] = f[keep]
        return (nl.astype(np.float16).view(np.uint16),
                lin.astype(np.float16).view(np.uint16))


_TO_NONLINEAR, _TO_LINEAR = _lut_nonlinear()


def _suffix(name: str) -> str:
    return name.rsplit(".", 1)[-1].lower()


def classify(channels) -> tuple[list[int], list[list[int]]]:
    """Default channel rules → (scheme per channel, CSC index groups).

    channels: sequence with .name / .pixel_type (PT_HALF == 1).  R,G,B
    HALF channels sharing a prefix form one CSC set (in R,G,B order).
    """
    schemes = []
    for ch in channels:
        if ch.pixel_type != 1:                    # only HALF is DCT/RLE
            schemes.append(_UNKNOWN)
        elif _suffix(ch.name) in ("r", "g", "b", "y", "by", "ry"):
            schemes.append(_LOSSY_DCT)
        elif _suffix(ch.name) == "a":
            schemes.append(_RLE)
        else:
            schemes.append(_UNKNOWN)
    by_prefix: dict[str, dict[str, int]] = {}
    for i, ch in enumerate(channels):
        if schemes[i] != _LOSSY_DCT:
            continue
        sfx = _suffix(ch.name)
        if sfx in ("r", "g", "b"):
            prefix = ch.name.rsplit(".", 1)[0] if "." in ch.name else ""
            by_prefix.setdefault(prefix, {})[sfx] = i
    csc = [[g["r"], g["g"], g["b"]] for g in by_prefix.values()
           if len(g) == 3]
    return schemes, csc


def _plane_order(channels, schemes, csc):
    """Deterministic DCT processing order: walk channels in chlist order;
    a CSC set is processed whole (R,G,B) at its first member; other DCT
    channels are processed alone.  → list of ('csc'|'solo', [indices])."""
    in_csc = {i: g for g in csc for i in g}
    done: set[int] = set()
    order = []
    for i in range(len(channels)):
        if schemes[i] != _LOSSY_DCT or i in done:
            continue
        if i in in_csc:
            g = in_csc[i]
            order.append(("csc", g))
            done.update(g)
        else:
            order.append(("solo", [i]))
            done.add(i)
    return order


def _csc709_forward(r, g, b):
    y = 0.2126 * r + 0.7152 * g + 0.0722 * b
    cb = (b - y) / 1.8556
    cr = (r - y) / 1.5748
    return y, cb, cr


def _csc709_inverse(y, cb, cr):
    r = y + 1.5748 * cr
    b = y + 1.8556 * cb
    g = (y - 0.2126 * r - 0.0722 * b) / 0.7152
    return r, g, b


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """[H,W] → [nby*nbx, 8, 8] with edge-replicated padding."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (p.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _unblocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = (blocks.reshape(ph // 8, pw // 8, 8, 8)
         .transpose(0, 2, 1, 3).reshape(ph, pw))
    return p[:h, :w]


def _quantize_to_sparse_half(coefs: np.ndarray, errs: np.ndarray
                             ) -> np.ndarray:
    """Round each f32 coefficient to the half with the fewest mantissa
    bits whose error stays within its budget (zeroing when |c| ≤ err).
    → uint16 half bit patterns, shape of coefs."""
    full = coefs.astype(np.float16)
    bits = full.view(np.uint16)
    out = bits.copy()
    # try coarse mantissas first (10 → 0 kept bits chooses the coarsest
    # that fits because later, finer candidates overwrite earlier ones
    # only where the coarser failed)
    chosen = np.zeros(coefs.shape, bool)
    for keep in range(0, 11):
        if keep == 10:
            cand = bits
        else:
            drop = 10 - keep
            mask = (~((1 << drop) - 1)) & 0xFFFFFFFF
            cand = ((bits.astype(np.uint32) + (1 << (drop - 1)))
                    & mask).astype(np.uint16)
        ok = (np.abs(cand.view(np.float16).astype(np.float32) - coefs)
              <= errs) & ~chosen
        out[ok] = cand[ok]
        chosen |= ok
    out[~chosen] = bits[~chosen]
    out[np.abs(coefs) <= errs] = 0
    return out


def _rle_ac(block_q: np.ndarray, out: list) -> None:
    """63 zig-zag AC halfs (uint16) → tokens appended to ``out``:
    nonzero halfs verbatim, zero runs as 0xff00|run (run ≤ 255)."""
    nz = np.flatnonzero(block_q)
    prev = 0
    for idx in nz:
        run = int(idx) - prev
        while run > 0:
            r = min(run, 255)
            out.append(0xFF00 | r)
            run -= r
        out.append(int(block_q[idx]))
        prev = int(idx) + 1
    run = 63 - prev
    while run > 0:
        r = min(run, 255)
        out.append(0xFF00 | r)
        run -= r


def _unrle_ac(tokens: np.ndarray, pos: int) -> tuple[np.ndarray, int]:
    """Inverse of _rle_ac: consume tokens from ``pos`` until 63 AC
    coefficients are filled.  → (uint16[63], new pos)."""
    ac = np.zeros(63, np.uint16)
    filled = 0
    while filled < 63:
        t = int(tokens[pos])
        pos += 1
        if (t & 0xFF00) == 0xFF00:
            filled += t & 0xFF
        else:
            ac[filled] = t
            filled += 1
    if filled != 63:
        raise ValueError("corrupt DWA AC stream (zero run overruns block)")
    return ac, pos


def _dct_plane_encode(plane_nl: np.ndarray, base_err: float,
                      dc_out: list, ac_out: list) -> None:
    """Nonlinearized f32 plane → quantized DC halfs + AC tokens."""
    blocks = _blocks_of(plane_nl)
    coefs = np.einsum("ky,byx,lx->bkl", _DCT_C, blocks, _DCT_C,
                      optimize=True)
    zz = coefs.reshape(-1, 64)[:, _ZIGZAG]
    q = _quantize_to_sparse_half(zz, base_err * _QUANT_W)
    dc_out.append(q[:, 0].copy())
    for b in range(q.shape[0]):
        _rle_ac(q[b, 1:], ac_out)


def _dct_plane_decode(dc: np.ndarray, ac_tokens: np.ndarray, ac_pos: int,
                      h: int, w: int) -> tuple[np.ndarray, int]:
    """DC halfs + AC token stream → f32 plane (still nonlinear domain)."""
    nblocks = (-(-h // 8)) * (-(-w // 8))
    zz = np.zeros((nblocks, 64), np.uint16)
    zz[:, 0] = dc
    for b in range(nblocks):
        zz[b, 1:], ac_pos = _unrle_ac(ac_tokens, ac_pos)
    coefs = np.zeros((nblocks, 64), np.float32)
    coefs[:, _ZIGZAG] = zz.view(np.float16).astype(np.float32)
    coefs = coefs.reshape(-1, 8, 8)
    blocks = np.einsum("ky,bkl,lx->byx", _DCT_C, coefs, _DCT_C,
                       optimize=True)
    return _unblocks(blocks, h, w), ac_pos


def dwa_compress(arrs: dict[str, np.ndarray], channels, width: int,
                 n_lines: int, level: float = 45.0) -> bytes:
    """Compress one chunk.  arrs: {name: [n_lines, width] in the channel's
    dtype}; channels: chlist-ordered _Channel sequence."""
    from pcss_unet_tpu.io.exr_py import _DTYPES, _rle_compress, \
        _zip_do_transform

    schemes, csc = classify(channels)
    base_err = float(level) / 100000.0

    dc_parts: list[np.ndarray] = []
    ac_tokens: list[int] = []
    rle_bytes = bytearray()
    unknown = bytearray()

    def nonlinearize(name):
        h16 = np.ascontiguousarray(arrs[name].astype(np.float16))
        nl = _TO_NONLINEAR[h16.view(np.uint16)]
        return nl.view(np.float16).astype(np.float32)

    for kind, idxs in _plane_order(channels, schemes, csc):
        planes = [nonlinearize(channels[i].name) for i in idxs]
        if kind == "csc":
            planes = list(_csc709_forward(*planes))
        for p in planes:
            _dct_plane_encode(p, base_err, dc_parts, ac_tokens)
    for i, ch in enumerate(channels):
        if schemes[i] == _RLE:
            bits = np.ascontiguousarray(
                arrs[ch.name].astype(np.float16)).view(np.uint16).ravel()
            rle_bytes += (bits & 0xFF).astype(np.uint8).tobytes()
            rle_bytes += (bits >> 8).astype(np.uint8).tobytes()
        elif schemes[i] == _UNKNOWN:
            unknown += np.ascontiguousarray(
                arrs[ch.name].astype(_DTYPES[ch.pixel_type])).tobytes()

    dc_all = (np.concatenate(dc_parts) if dc_parts
              else np.zeros(0, np.uint16))
    ac_all = np.asarray(ac_tokens, np.uint16)

    unknown_z = zlib.compress(bytes(unknown)) if unknown else b""
    if ac_all.size:
        from pcss_unet_tpu.io.piz import huf_compress

        ac_z = huf_compress(ac_all)
    else:
        ac_z = b""
    dc_z = (zlib.compress(_zip_do_transform(dc_all.tobytes()))
            if dc_all.size else b"")
    if rle_bytes:
        rle_rle = _rle_compress(bytes(rle_bytes))
        rle_z = zlib.compress(rle_rle)
    else:
        rle_rle = b""
        rle_z = b""

    header = struct.pack(
        "<11Q", 1, len(unknown), len(unknown_z), len(ac_z), len(dc_z),
        len(rle_z), len(rle_rle), len(rle_bytes), ac_all.size, dc_all.size,
        AC_STATIC_HUFFMAN)
    return header + unknown_z + ac_z + dc_z + rle_z


def dwa_decompress(payload: bytes, channels, width: int, n_lines: int
                   ) -> dict[str, np.ndarray]:
    """Decompress one chunk → {name: [n_lines, width] float32}."""
    from pcss_unet_tpu.io.exr_py import _DTYPES, _rle_decompress, \
        _zip_undo_transform

    if len(payload) < 88:
        raise ValueError("truncated DWA chunk")
    (version, unk_usize, unk_csize, ac_csize, dc_csize, rle_csize,
     rle_usize, rle_raw, ac_count, dc_count, ac_comp) = struct.unpack_from(
        "<11Q", payload, 0)
    pos = 88
    if version >= 2:
        # serialized channel rules: skip, apply defaults (module docstring)
        (rule_size,) = struct.unpack_from("<H", payload, pos)
        if rule_size < 2:
            raise ValueError("corrupt DWA channel-rules block")
        pos += rule_size
    unknown = zlib.decompress(payload[pos:pos + unk_csize]) \
        if unk_csize else b""
    pos += unk_csize
    ac_blob = payload[pos:pos + ac_csize]
    pos += ac_csize
    dc_blob = payload[pos:pos + dc_csize]
    pos += dc_csize
    rle_blob = payload[pos:pos + rle_csize]

    if ac_count:
        if ac_comp == AC_STATIC_HUFFMAN:
            from pcss_unet_tpu.io.piz import huf_decompress

            ac_tokens = huf_decompress(ac_blob, int(ac_count))
        elif ac_comp == AC_DEFLATE:
            ac_tokens = np.frombuffer(zlib.decompress(ac_blob), np.uint16)
        else:
            raise ValueError(f"unknown DWA AC compression {ac_comp}")
    else:
        ac_tokens = np.zeros(0, np.uint16)
    dc_all = (np.frombuffer(
        _zip_undo_transform(bytearray(zlib.decompress(dc_blob))),
        np.uint16) if dc_count else np.zeros(0, np.uint16))
    rle_raw_bytes = (_rle_decompress(zlib.decompress(rle_blob),
                                     int(rle_raw)) if rle_csize else b"")

    schemes, csc = classify(channels)
    out: dict[str, np.ndarray] = {}
    blocks_per_plane = (-(-n_lines // 8)) * (-(-width // 8))
    dc_pos = 0
    ac_pos = 0
    for kind, idxs in _plane_order(channels, schemes, csc):
        planes = []
        for _ in idxs:
            dc = dc_all[dc_pos: dc_pos + blocks_per_plane]
            dc_pos += blocks_per_plane
            plane, ac_pos = _dct_plane_decode(dc, ac_tokens, ac_pos,
                                              n_lines, width)
            planes.append(plane)
        if kind == "csc":
            planes = list(_csc709_inverse(*planes))
        for i, plane in zip(idxs, planes):
            lin = _TO_LINEAR[plane.astype(np.float16).view(np.uint16)]
            out[channels[i].name] = \
                lin.view(np.float16).astype(np.float32)

    rpos = 0
    npix = n_lines * width
    for i, ch in enumerate(channels):
        if schemes[i] != _RLE:
            continue
        lo = np.frombuffer(rle_raw_bytes, np.uint8, npix, rpos)
        hi = np.frombuffer(rle_raw_bytes, np.uint8, npix, rpos + npix)
        rpos += 2 * npix
        bits = (hi.astype(np.uint16) << 8) | lo
        out[ch.name] = bits.view(np.float16).astype(np.float32).reshape(
            n_lines, width)

    upos = 0
    for i, ch in enumerate(channels):
        if schemes[i] != _UNKNOWN:
            continue
        dt = _DTYPES[ch.pixel_type]
        nb = npix * dt.itemsize
        vals = np.frombuffer(unknown, dt, npix, upos)
        upos += nb
        out[ch.name] = vals.astype(np.float32).reshape(n_lines, width)
    return out
