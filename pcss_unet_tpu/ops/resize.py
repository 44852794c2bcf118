"""Bilinear resize with ``align_corners=True`` semantics.

The reference upsamples with ``nn.Upsample(scale_factor=2, mode='bilinear',
align_corners=True)`` (Unetmodel.py:51-60), re-matches decoder/skip spatial
sizes with ``F.interpolate(..., align_corners=True)`` (Unetmodel.py:118-119),
and fixes odd inputs the same way (Unetmodel.py:93-97).  ``jax.image.resize``
implements half-pixel-center sampling, which differs from align-corners and
breaks PSNR parity with torch checkpoints (SURVEY.md §7 hard-part 1), so we
implement the align-corners sample grid directly.

Two implementations, selected by ``method``:

- ``matmul`` (default): each axis resize is a contraction with a precomputed
  banded interpolation matrix (2 non-zeros per row), run on the MXU with
  fp32 accumulation.  On TPU this is far faster than gathers — gathers
  serialize on the VPU while the matrix form rides the systolic array — and
  it makes *compositions* of resizes foldable (``compose_resize_matrices``).
- ``gather``: two ``jnp.take``s + lerp per axis; bandwidth-bound reference
  implementation.

Both produce the align-corners sample grid exactly; parity with torch is
pinned in tests/test_ops.py for each method.

Layout: NHWC (TPU-native), resizing axes 1 (H) and 2 (W).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _axis_coords(in_size: int, out_size: int, dtype=jnp.float32):
    """Source coordinates for align_corners=True: i * (in-1)/(out-1)."""
    if out_size == 1:
        scale = 0.0
    else:
        scale = (in_size - 1) / (out_size - 1)
    coords = jnp.arange(out_size, dtype=dtype) * scale
    lo = jnp.clip(jnp.floor(coords), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = (coords - lo.astype(dtype))
    return lo, hi, frac


def _resize_axis_gather(x: jax.Array, axis: int, out_size: int) -> jax.Array:
    in_size = x.shape[axis]
    lo, hi, frac = _axis_coords(in_size, out_size, jnp.float32)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = frac.reshape(shape).astype(x.dtype)
    return x_lo + (x_hi - x_lo) * w


@functools.lru_cache(maxsize=256)
def interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] align-corners interpolation matrix: row i has (1−f) at
    ⌊c⌋ and f at ⌊c⌋+1 for c = i·(in−1)/(out−1).  float32, host-computed
    once per shape and folded into the jitted graph as a constant."""
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    coords = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.clip(np.floor(coords), 0, in_size - 1).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    f = (coords - lo).astype(np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - f)
    np.add.at(m, (rows, hi), f)
    return m


def compose_resize_matrices(sizes_h: tuple[int, ...],
                            sizes_w: tuple[int, ...]) -> tuple[np.ndarray, np.ndarray]:
    """Fold a chain of align-corners resizes into one matrix per axis.
    ``sizes_h=(544, 1088, 544)`` means 544→1088→544; the returned [544,544]
    matrix applies both in a single contraction (exact: composition of
    linear maps)."""
    def chain(sizes):
        m = None
        for a, b in zip(sizes[:-1], sizes[1:]):
            step = interp_matrix(a, b)
            m = step if m is None else step @ m
        return np.eye(sizes[0], dtype=np.float32) if m is None else m
    return chain(sizes_h), chain(sizes_w)


def _banded_plan(m: np.ndarray, block: int, align: int):
    """Static per-output-block input windows covering every nonzero.

    Align-corners interpolation matrices are BANDED — ≤2 nonzeros per row
    (≤4 after composition) hugging a diagonal of slope in/out — so a dense
    [O, I] contraction wastes ~I/band of its MXU work on zeros.  For each
    ``block`` output rows, find the aligned input window [lo, hi) holding
    all their nonzeros; the dense dot then shrinks to [block, hi−lo].
    ``align`` keeps slices layout-friendly (128 on a lane axis, 8 on a
    sublane axis)."""
    out_size, in_size = m.shape
    plan = []
    for r0 in range(0, out_size, block):
        rows = min(block, out_size - r0)
        nz = np.nonzero(np.any(m[r0:r0 + rows] != 0, axis=0))[0]
        if len(nz) == 0:        # all-zero output rows (pad rows)
            plan.append((r0, rows, 0, min(align, in_size)))
            continue
        lo = (int(nz.min()) // align) * align
        hi = min(in_size, ((int(nz.max()) // align) + 1) * align)
        plan.append((r0, rows, lo, hi))
    return plan


def banded_apply(x: jax.Array, m: np.ndarray, axis: int, *,
                 align: int = 1, block: int = 128) -> jax.Array:
    """Contract a static banded matrix against ``axis`` of ``x`` —
    out[..., o, ...] = Σ_i m[o, i]·x[..., i, ...] — as per-block dense
    dots over each block's nonzero input window.  Exact vs the dense
    einsum (the skipped terms are exactly zero).  Falls back to the dense
    contraction when banding would save <25 % of the FLOPs."""
    m = np.asarray(m)
    plan = _banded_plan(m, block, align)
    dense_work = m.shape[0] * m.shape[1]
    banded_work = sum(rows * (hi - lo) for _, rows, lo, hi in plan)
    dtype = x.dtype
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    letters = "nabc"[:x.ndim]
    in_sub = letters
    out_sub = letters[:axis] + "o" + letters[axis + 1:]
    eq = f"o{letters[axis]},{in_sub}->{out_sub}"
    if banded_work > 0.75 * dense_work:
        return jnp.einsum(eq, jnp.asarray(m, dtype), x, precision=prec,
                          preferred_element_type=jnp.float32).astype(dtype)
    outs = []
    for r0, rows, lo, hi in plan:
        seg = jax.lax.slice_in_dim(x, lo, hi, axis=axis)
        blk = jnp.asarray(m[r0:r0 + rows, lo:hi], dtype)
        outs.append(jnp.einsum(eq, blk, seg, precision=prec,
                               preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=axis).astype(dtype)


def _apply_hw_matrices(x: jax.Array, m_h: np.ndarray | None,
                       m_w: np.ndarray | None) -> jax.Array:
    """NHWC model-path resizes run the DENSE MXU contraction.

    Banding here (briefly the round-5 default) saves ~97 % of the
    interp-matmul FLOPs but splits each resize into ~H/128 small dots
    with slice/concat glue — a win only where the MXU is idle.  The
    bandwidth-bound trimmed net deploys through the channels-major
    engine (which calls banded_apply directly and keeps the win), while
    the NHWC path's main consumer is the MXU-fed w64 net, where the r5e
    sweep measured the banded graph ~1 ms slower at 1080p
    (logs/bench_r5e.jsonl fused_int8 16.08 / fused 20.14 vs r4c's 14.47
    canonical; the revert A/B is logs/bench_r5g.jsonl — dense restores
    14.57 ms, so shuffles cost 0.4 ms and banding 1.1 of the 1.6 gap).
    PCSS_BANDED_RESIZE=1 forces banding back on for A/B."""
    if os.environ.get("PCSS_BANDED_RESIZE") == "1":
        if m_h is not None and not _is_identity(m_h):
            x = banded_apply(x, m_h, axis=1, align=1)
        if m_w is not None and not _is_identity(m_w):
            x = banded_apply(x, m_w, axis=2, align=8)
        return x
    dtype = x.dtype
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    if m_h is not None and not _is_identity(m_h):
        mh = jnp.asarray(m_h, dtype)
        x = jnp.einsum("oh,nhwc->nowc", mh, x, precision=prec,
                       preferred_element_type=jnp.float32).astype(dtype)
    if m_w is not None and not _is_identity(m_w):
        mw = jnp.asarray(m_w, dtype)
        x = jnp.einsum("ow,nhwc->nhoc", mw, x, precision=prec,
                       preferred_element_type=jnp.float32).astype(dtype)
    return x


def _is_identity(m: np.ndarray) -> bool:
    return m.shape[0] == m.shape[1] and np.array_equal(
        m, np.eye(m.shape[0], dtype=m.dtype))


def resize_with_matrices(x: jax.Array, m_h: np.ndarray,
                         m_w: np.ndarray) -> jax.Array:
    """Apply precomputed per-axis interpolation matrices (e.g. a folded
    resize chain from ``compose_resize_matrices``)."""
    return _apply_hw_matrices(x, m_h, m_w)


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int],
                                  method: str = "matmul") -> jax.Array:
    """Resize NHWC ``x`` to spatial size ``out_hw`` with align-corners
    bilinear.  Matches ``F.interpolate(x, out_hw, mode='bilinear',
    align_corners=True)`` (reference Unetmodel.py:119)."""
    out_h, out_w = out_hw
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    if method == "matmul":
        m_h = interp_matrix(h, out_h) if h != out_h else None
        m_w = interp_matrix(w, out_w) if w != out_w else None
        return _apply_hw_matrices(x, m_h, m_w)
    if h != out_h:
        x = _resize_axis_gather(x, 1, out_h)
    if w != out_w:
        x = _resize_axis_gather(x, 2, out_w)
    return x


def upsample2x_align_corners(x: jax.Array, method: str = "matmul") -> jax.Array:
    """`nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)`
    (reference Unetmodel.py:51).  torch computes the output size as
    floor(in * 2), then samples with the align-corners grid."""
    n, h, w, c = x.shape
    return resize_bilinear_align_corners(x, (h * 2, w * 2), method)


# ---------------------------------------------------------------------------
# Window-consistent resizes for spatially-sharded inference
# ---------------------------------------------------------------------------
#
# Align-corners coefficients depend on the GLOBAL image height (scale =
# (in-1)/(out-1)), so a window's local resize is NOT a crop of the
# full-frame resize.  These variants compute the window's rows of the
# *global* resize: slice the global interpolation matrix at a traced row
# offset (dynamic_slice — works under shard_map where the offset is a
# function of axis_index).  Output rows within the matrix band (≤2 rows) of
# the window edges lose out-of-window contributions; callers crop a margin
# ≥ the network's receptive-field halo, which subsumes the band.


def _einsum_rows(x: jax.Array, m_h: jax.Array) -> jax.Array:
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    return jnp.einsum("oh,nhwc->nowc", m_h.astype(x.dtype), x,
                      precision=prec,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _einsum_cols(x: jax.Array, m_w: jax.Array) -> jax.Array:
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    return jnp.einsum("ow,nhwc->nhoc", m_w.astype(x.dtype), x,
                      precision=prec,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def upsample2x_window(x: jax.Array, global_h: int, row_off) -> jax.Array:
    """Rows [2·row_off, 2·row_off + 2·h_loc) of the GLOBAL align-corners 2×
    upsample of a ``global_h``-row image, computed from the window rows
    [row_off, row_off + h_loc).  ``row_off`` may be traced (int32 scalar);
    ``global_h`` is static.  The W axis is global (unsharded)."""
    n, h, w, c = x.shape
    m_g = jnp.asarray(interp_matrix(global_h, global_h * 2))
    m_h = jax.lax.dynamic_slice(m_g, (2 * row_off, row_off), (2 * h, h))
    x = _einsum_rows(x, m_h)
    return _einsum_cols(x, jnp.asarray(interp_matrix(w, w * 2)))


def resize_rows_window(x: jax.Array, m_h_global: np.ndarray,
                       m_w: np.ndarray, out_off, in_off) -> jax.Array:
    """Apply a global square row-resize matrix to a window: rows
    [out_off, out_off + h_loc) × cols [in_off, in_off + h_loc) of
    ``m_h_global`` (offsets traced), then the full (global) ``m_w``."""
    n, h, w, c = x.shape
    m_h = jax.lax.dynamic_slice(jnp.asarray(m_h_global),
                                (out_off, in_off), (h, h))
    x = _einsum_rows(x, m_h)
    if not _is_identity(m_w):
        x = _einsum_cols(x, jnp.asarray(m_w))
    return x
