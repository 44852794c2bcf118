"""Shared 3×3 tap contraction for the NHWC row-band kernels.

Every NHWC-layout kernel in this package (convblock128, block_int8's plain
and k-chunked variants, conv3x3_int8) expresses the 3×3 SAME conv the same
way: the band plus one halo row above/below sits in VMEM as
``ext [k_rows+2, W, C]``; each of the 9 taps is a dy row-slice combined
with a dx column shift (zero column at the W edge), flattened to
``[k_rows·W, C]`` and contracted against that tap's ``[C, Co]`` weight
matrix on the MXU.  Commit 2d49561's sharded-window fix showed why this
must live in ONE place — a tap-math fix replicated by hand across four
kernels is how they silently diverge.

(The channels-major kernel in convblock.py uses a different, lane-oriented
tap strategy and deliberately does not share this helper.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv3x3_band_taps(ext, w_taps, k_rows: int, acc_dtype, cast=None):
    """Nine-tap 3×3 SAME conv over one row band, as 9 MXU matmuls.

    ext    [k_rows+2, W, Cin]  band rows with one halo row above and below
    w_taps [9, Cin, Co]        tap order ``dy*3 + dx + 1`` (dy, dx ∈ {-1,0,1})
    Returns ``[k_rows·W, Co]`` accumulated in ``acc_dtype`` (int32 for the
    int8 kernels, float32 otherwise).  ``cast`` optionally casts each tap
    and weight before the dot — the interpret-mode f32 shim (the CPU
    runtime's DotThunk lacks bf16×bf16→f32 at some shapes).
    """
    w = ext.shape[1]
    co = w_taps.shape[2]
    acc = jnp.zeros((k_rows * w, co), acc_dtype)
    zcol = jnp.zeros((k_rows, 1, ext.shape[2]), ext.dtype)
    for dy in range(3):
        rows = ext[dy: dy + k_rows]
        for dx in (-1, 0, 1):
            if dx == 0:
                tap = rows
            elif dx == 1:
                tap = jnp.concatenate([rows[:, 1:, :], zcol], axis=1)
            else:
                tap = jnp.concatenate([zcol, rows[:, :-1, :]], axis=1)
            tap2d = tap.reshape(k_rows * w, -1)
            wmat = w_taps[dy * 3 + dx + 1]
            if cast is not None:
                tap2d = tap2d.astype(cast)
                wmat = wmat.astype(cast)
            acc += jax.lax.dot_general(
                tap2d, wmat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
    return acc
