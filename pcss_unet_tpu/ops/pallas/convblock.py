"""Fused ConvBlock Pallas kernel for the small-channel stages.

The network's 544×960 stages (enc_0: 16→16→64, dec_final: 64→64→16) are
bandwidth-bound, but XLA runs them ~10× over the HBM bound: with NHWC and
C≤64, the channel (lane) dimension fills at most half a 128-lane register,
and the conv window gather costs extra passes (measured ~0.5 ms marginal
per 16-ch 3×3 conv at 544×960 vs a ~0.04 ms traffic bound;
docs/BENCHMARKS.md "Pallas fused ConvBlock").

This kernel computes a whole folded-BN ConvBlock —

    LeakyReLU(W2 · LeakyReLU(conv3×3(x, W1) + b1) + b2)

(reference DoubleConv, Unetmodel.py:17-33, in its BN-folded inference
form) — in ONE pass over the frame, in a **channels-major layout**:
``x [Cin, H·Wp]`` puts pixels on the lane axis (always full 128-lane
registers) and channels on sublanes.  The 3×3 window never materializes:
each of the 9 taps is a lane-roll of the same block feeding an MXU
contraction over channels, accumulated in fp32:

    acc[Cmid, kWp] = Σ_tap  W1[tap] [Cmid,Cin] @ roll(band_dy, -dx) [Cin,kWp]

SAME zero-padding comes for free: the frame is padded W→Wp (next multiple
of 128, ≥1 zero column), so lane rolls wrap zeros in at row edges; the
vertical halo is one row-band passed three times (prev/cur/next BlockSpec
index maps), with the stolen strips zeroed at the top/bottom bands.

Forward/inference only; training keeps the autodiffable XLA composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _convblock_kernel(*refs, k_rows: int, wp: int,
                      negative_slope: float, stack_taps: bool = False,
                      acc_shift: bool = False, interpret: bool = False,
                      has_mask: bool = False, has_residual: bool = False):
    (prev_ref, cur_ref, next_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     *extra) = refs[:-1]
    out_ref = refs[-1]
    mask_ref = extra.pop(0) if has_mask else None
    res_ref = extra.pop(0) if has_residual else None

    def _epilogue(out):
        """Fused post-ops: residual (skip) add, then pad-column re-zero.
        Both replace full read+write XLA passes over the tensor in the
        channels-major engine (infer/chw_engine.py)."""
        if res_ref is not None:
            out = out + res_ref[0].astype(jnp.float32)
        if mask_ref is not None:
            # [1, Wp] {0,1} mask tiled across the band: zero the pad
            # columns in-register so the output satisfies the kernels'
            # zero-pad input contract with no separate masking pass
            tiled = jnp.concatenate([mask_ref[:]] * k_rows, axis=1)
            out = out * tiled.astype(jnp.float32)
        return out

    i = pl.program_id(0)
    n = pl.num_programs(0)
    # interpret mode inlines these dots as XLA CPU ops, and the CPU
    # runtime's DotThunk lacks bf16×bf16→f32 at some shapes — compute in
    # f32 there (the TPU compiled path keeps the input dtype on the MXU)
    compute_dt = jnp.float32 if interpret else cur_ref.dtype

    prev_last = prev_ref[0, :, (k_rows - 1) * wp:]       # [Cin, Wp]
    next_first = next_ref[0, :, :wp]                     # [Cin, Wp]
    # top/bottom frame edge: the halo row is SAME zero padding
    prev_last = jnp.where(i == 0, jnp.zeros_like(prev_last), prev_last)
    next_first = jnp.where(i == n - 1, jnp.zeros_like(next_first),
                           next_first)
    ext = jnp.concatenate([prev_last, cur_ref[0], next_first], axis=1)

    cmid = b1_ref.shape[0]
    if acc_shift:
        # Tap shifts moved to the OUTPUT: conv linearity gives
        #   Σ_dx shift_dx(W_dx @ x) = Σ_dx W_dx @ shift_dx(x),
        # so the 6 per-input lane shifts + 9 tap materializations collapse
        # to 9 dots on FREE lane-aligned ext slices (dy offsets are
        # multiples of wp ≡ 0 mod 128) followed by TWO lane shifts of the
        # [Cmid, k·Wp] fp32 accumulators.  Zero-pad columns stay zero
        # through the dot (W @ 0 = 0, bias added after the combine), so
        # row-boundary crossings still land on zeros — exact SAME padding.
        accs = [jnp.zeros((cmid, k_rows * wp), jnp.float32)
                for _ in range(3)]                   # dx = -1, 0, +1
        for dy in range(3):
            band = ext[:, dy * wp: dy * wp + k_rows * wp]
            bandc = band.astype(compute_dt)
            for g in range(3):                       # tap t = dy*3 + dx+1
                accs[g] += jax.lax.dot_general(
                    w1_ref[dy * 3 + g].astype(compute_dt), bandc,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        zacc = jnp.zeros((cmid, 1), jnp.float32)
        acc = accs[1]
        # dx=+1: out[p] += (W_+1 @ x)[p+1] → shift the accumulator left
        acc += jnp.concatenate([accs[2][:, 1:], zacc], axis=1)
        # dx=-1: out[p] += (W_-1 @ x)[p-1] → shift right
        acc += jnp.concatenate([zacc, accs[0][:, :-1]], axis=1)
        h = acc + b1_ref[:].astype(jnp.float32)
        h = jnp.where(h >= 0, h, h * negative_slope).astype(compute_dt)
        out = jax.lax.dot_general(
            w2_ref[:].astype(compute_dt), h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + b2_ref[:].astype(jnp.float32)
        out = jnp.where(out >= 0, out, out * negative_slope)
        out_ref[0] = _epilogue(out).astype(out_ref.dtype)
        return
    taps = []
    for dy in range(3):
        band = ext[:, dy * wp: dy * wp + k_rows * wp]
        zcol = jnp.zeros((band.shape[0], 1), band.dtype)
        for dx in (-1, 0, 1):
            # lane shift by ±1 pixel as slice+zero-fill (Mosaic has no bf16
            # rotate); row-boundary crossings land in the zero-pad columns,
            # so this is exactly SAME zero padding
            if dx == 0:
                tap = band
            elif dx == 1:          # out[p] needs in[p+1] → shift left
                tap = jnp.concatenate([band[:, 1:], zcol], axis=1)
            else:                  # out[p] needs in[p-1] → shift right
                tap = jnp.concatenate([zcol, band[:, :-1]], axis=1)
            taps.append(tap)
    if stack_taps == "chunk128":
        # taps grouped into exact K=128 chunks (floor(128/Cin) taps per
        # dot): if the MXU bills ceil(K/128) full streaming passes per
        # dot, the single K=9·Cin contraction pays 2 passes at Cin=16
        # (K=144) where 128+16 pays ~1.1 — a hardware A/B candidate for
        # the N-stream-bound small-channel stages (scripts/bench_taps.py)
        cin = taps[0].shape[0]
        per = max(1, 128 // cin)
        acc = jnp.zeros((cmid, k_rows * wp), jnp.float32)
        col = 0
        for t0 in range(0, 9, per):
            group = taps[t0:t0 + per]
            chunk = (group[0] if len(group) == 1
                     else jnp.concatenate(group, axis=0))
            kk = chunk.shape[0]
            acc += jax.lax.dot_general(
                w1_ref[:, col:col + kk].astype(compute_dt),
                chunk.astype(compute_dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            col += kk
    elif stack_taps:
        # ONE K=9·Cin MXU contraction instead of 9 K=Cin ones: stack the
        # shifted taps along sublanes against the pre-flattened w1
        # [Cmid, 9·Cin] (stacked host-side — Mosaic can't relayout the
        # [9,Cmid,Cin] ref in-kernel).  Trades 9 short-K pipeline fills
        # for one long-K pass plus a sublane-concat of the taps.
        stacked = jnp.concatenate(taps, axis=0)          # [9·Cin, kWp]
        acc = jax.lax.dot_general(
            w1_ref[:].astype(compute_dt), stacked.astype(compute_dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((cmid, k_rows * wp), jnp.float32)
        for t, tap in enumerate(taps):
            w_tap = w1_ref[t]                            # [Cmid, Cin]
            acc += jax.lax.dot_general(
                w_tap.astype(compute_dt), tap.astype(compute_dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    h = acc + b1_ref[:].astype(jnp.float32)
    h = jnp.where(h >= 0, h, h * negative_slope).astype(compute_dt)
    out = jax.lax.dot_general(
        w2_ref[:].astype(compute_dt), h,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32)
    out = jnp.where(out >= 0, out, out * negative_slope)
    out_ref[0] = _epilogue(out).astype(out_ref.dtype)


def _rowpack_kernel(*refs, k_rows: int, wp: int, r_rows: int, cout: int,
                    negative_slope: float, interpret: bool = False,
                    has_mask: bool = False, has_residual: bool = False):
    """M-packed variant: each MXU pass computes ``r_rows`` OUTPUT ROWS ×
    Cmid channels at once (M = r_rows·Cmid instead of Cmid).

    Why: the small-channel stages are N-stream-bound on the MXU — a
    [Cmid≤32, K] @ [K, N] pass costs ~N·ceil(K/128) columns of streaming
    regardless of how empty the M side of the systolic array is, and at
    Cmid=16 the array is 12.5 % occupied.  Packing r_rows=128//Cmid
    output rows into M cuts the streamed N by r_rows× for the same
    MACs: the 3×3 conv becomes W1p [r·Cmid, 3·(r+2)·Cin] @ U [., Wp]
    (block-Toeplitz weight, full im2col over the r+2-row window), and
    the 1×1 conv a block-diagonal [r·Cout, r·Cmid] dot.
    """
    (prev_ref, cur_ref, next_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     *extra) = refs[:-1]
    out_ref = refs[-1]
    mask_ref = extra.pop(0) if has_mask else None
    res_ref = extra.pop(0) if has_residual else None

    i = pl.program_id(0)
    n = pl.num_programs(0)
    compute_dt = jnp.float32 if interpret else cur_ref.dtype
    prev_last = prev_ref[0, :, (k_rows - 1) * wp:]       # [Cin, Wp]
    next_first = next_ref[0, :, :wp]
    prev_last = jnp.where(i == 0, jnp.zeros_like(prev_last), prev_last)
    next_first = jnp.where(i == n - 1, jnp.zeros_like(next_first),
                           next_first)
    ext = jnp.concatenate([prev_last, cur_ref[0], next_first], axis=1)

    chunks = []
    for base in range(0, k_rows, r_rows):
        # window = ext rows base..base+r+1 (r+2 rows), sublane-stacked
        v = jnp.concatenate(
            [ext[:, (base + j) * wp:(base + j + 1) * wp]
             for j in range(r_rows + 2)], axis=0)       # [(r+2)·Cin, Wp]
        zcol = jnp.zeros((v.shape[0], 1), v.dtype)
        v_r = jnp.concatenate([zcol, v[:, :-1]], axis=1)   # dx = -1
        v_l = jnp.concatenate([v[:, 1:], zcol], axis=1)    # dx = +1
        u = jnp.concatenate([v_r, v, v_l], axis=0)  # dx-major, matches W1p
        acc = jax.lax.dot_general(
            w1_ref[:].astype(compute_dt), u.astype(compute_dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [r·Cmid, Wp]
        h = acc + b1_ref[:].astype(jnp.float32)
        h = jnp.where(h >= 0, h, h * negative_slope).astype(compute_dt)
        o = jax.lax.dot_general(
            w2_ref[:].astype(compute_dt), h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [r·Cout, Wp]
        o = o + b2_ref[:].astype(jnp.float32)
        o = jnp.where(o >= 0, o, o * negative_slope)
        # un-pack: [r·Cout, Wp] → [Cout, r·Wp] (row s on lanes s·Wp..)
        chunks.append(jnp.concatenate(
            [o[s * cout:(s + 1) * cout] for s in range(r_rows)], axis=1))
    out = jnp.concatenate(chunks, axis=1)               # [Cout, k·Wp] fp32
    if res_ref is not None:
        out = out + res_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        tiled = jnp.concatenate([mask_ref[:]] * k_rows, axis=1)
        out = out * tiled.astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def rowpack_r(cin: int, cmid: int, cout: int) -> int:
    """Output rows per MXU pass: fill M=128 with r·max(Cmid, Cout)."""
    return max(1, 128 // max(cmid, cout))


def _pack_rowpack_weights(w1, b1, w2, b2, r_rows: int):
    """[9,Cmid,Cin] taps → block-Toeplitz W1p [r·Cmid, 3·(r+2)·Cin]
    (dx-major blocks, window-row minor) + block-diagonal W2p
    [r·Cout, r·Cmid]; biases tiled per packed row group."""
    import jax.numpy as jnp

    _, cmid, cin = w1.shape
    cout = w2.shape[0]
    win = r_rows + 2
    w1p = jnp.zeros((r_rows * cmid, 3 * win * cin), w1.dtype)
    for s in range(r_rows):
        for dy in range(3):
            for dx in range(3):       # dx index 0,1,2 ↔ dx = -1, 0, +1
                col = dx * win * cin + (s + dy) * cin
                w1p = w1p.at[s * cmid:(s + 1) * cmid,
                             col:col + cin].set(w1[dy * 3 + dx])
    w2p = jnp.zeros((r_rows * cout, r_rows * cmid), w2.dtype)
    for s in range(r_rows):
        w2p = w2p.at[s * cout:(s + 1) * cout,
                     s * cmid:(s + 1) * cmid].set(w2)
    return (w1p, jnp.tile(b1, (r_rows, 1)), w2p, jnp.tile(b2, (r_rows, 1)))


@functools.partial(jax.jit, static_argnames=("k_rows", "negative_slope",
                                             "interpret", "stack_taps",
                                             "acc_shift", "true_w",
                                             "rowpack"))
def fused_conv_block_chw(x: jax.Array, w1: jax.Array, b1: jax.Array,
                         w2: jax.Array, b2: jax.Array, *, k_rows: int = 16,
                         negative_slope: float = 0.2,
                         interpret: bool = False,
                         stack_taps: bool = False,
                         acc_shift: bool = False,
                         true_w: int | None = None,
                         residual: jax.Array | None = None,
                         rowpack: bool = False) -> jax.Array:
    """x [N, Cin, H, Wp] (W already zero-padded to a multiple of 128 with at
    least one pad column; pad rows if H % k_rows) → [N, Cout, H, Wp].

    w1 [9, Cmid, Cin] (tap = dy·3+dx), b1 [Cmid, 1], w2 [Cout, Cmid],
    b2 [Cout, 1].

    ``true_w``: when given, the kernel re-zeroes the W pad columns in its
    epilogue (lane positions ≥ true_w), so the output directly satisfies
    the zero-pad input contract of the next kernel — no separate masking
    pass.  ``residual``: optional [N, Cout, H, Wp] tensor added to the
    block output in-kernel (the U-Net's additive skip, Unetmodel.py:125).
    """
    n, cin, h, wp = x.shape
    assert wp % 128 == 0, f"Wp must be lane-aligned, got {wp}"
    assert h % k_rows == 0, f"H={h} not divisible by k_rows={k_rows}"
    cmid = w1.shape[1]
    cout = w2.shape[0]
    bands = h // k_rows
    x2 = x.reshape(n, cin, h * wp)
    grid = (bands, n)
    if sum(map(bool, (stack_taps, acc_shift, rowpack))) > 1:
        raise ValueError("stack_taps / acc_shift / rowpack are exclusive "
                         "tap strategies")
    r_rows = 0
    if rowpack:
        r_rows = rowpack_r(cin, cmid, cout)
        while k_rows % r_rows:
            r_rows //= 2
        w1, b1, w2, b2 = _pack_rowpack_weights(w1, b1, w2, b2, r_rows)
        w1_spec_shape = tuple(w1.shape)
        b_shapes = ((r_rows * cmid, 1), (r_rows * cout, r_rows * cmid),
                    (r_rows * cout, 1))
    elif stack_taps:
        # pre-flatten [9,Cmid,Cin] → [Cmid, 9·Cin] in XLA land; tap t's
        # block column t·Cin:(t+1)·Cin pairs with taps[t] in the kernel
        w1 = w1.transpose(1, 0, 2).reshape(cmid, 9 * cin)
        w1_spec_shape = (cmid, 9 * cin)
        b_shapes = ((cmid, 1), (cout, cmid), (cout, 1))
    else:
        w1_spec_shape = (9, cmid, cin)
        b_shapes = ((cmid, 1), (cout, cmid), (cout, 1))

    def band_spec(off):
        return pl.BlockSpec(
            (1, cin, k_rows * wp),
            lambda i, b, o=off: (b, 0, jnp.clip(i + o, 0, bands - 1)),
            memory_space=pltpu.VMEM)

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, b: (0,) * len(shape), memory_space=pltpu.VMEM)

    operands = [x2, x2, x2, w1, b1, w2, b2]
    in_specs = [band_spec(-1), band_spec(0), band_spec(+1),
                full(w1_spec_shape), full(b_shapes[0]),
                full(b_shapes[1]), full(b_shapes[2])]
    if true_w is not None:
        mask = np.zeros((1, wp), np.float32)
        mask[0, :true_w] = 1.0
        operands.append(jnp.asarray(mask, x.dtype))
        in_specs.append(full((1, wp)))
    if residual is not None:
        assert residual.shape == (n, cout, h, wp), residual.shape
        operands.append(residual.reshape(n, cout, h * wp))
        in_specs.append(pl.BlockSpec((1, cout, k_rows * wp),
                                     lambda i, b: (b, 0, i),
                                     memory_space=pltpu.VMEM))

    if rowpack:
        kernel = functools.partial(
            _rowpack_kernel, k_rows=k_rows, wp=wp, r_rows=r_rows,
            cout=cout, negative_slope=negative_slope, interpret=interpret,
            has_mask=true_w is not None,
            has_residual=residual is not None)
    else:
        kernel = functools.partial(
            _convblock_kernel, k_rows=k_rows, wp=wp,
            negative_slope=negative_slope,
            stack_taps=stack_taps, acc_shift=acc_shift,
            interpret=interpret, has_mask=true_w is not None,
            has_residual=residual is not None)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, cout, h * wp), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cout, k_rows * wp),
                               lambda i, b: (b, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands)
    return out.reshape(n, cout, h, wp)


def pack_convblock_params(params: dict, dtype=jnp.bfloat16):
    """Flax folded-BN ConvBlock params → kernel operand pack.

    ``params`` is the block's param subtree: conv_a {kernel [3,3,Cin,Cmid],
    bias [Cmid]}, conv_b {kernel [1,1,Cmid,Cout], bias [Cout]} (BN already
    folded into kernels/biases by models/fold_bn.py)."""
    ka = np.asarray(params["conv_a"]["kernel"], np.float32)  # HWIO
    ba = np.asarray(params["conv_a"]["bias"], np.float32)
    kb = np.asarray(params["conv_b"]["kernel"], np.float32)
    bb = np.asarray(params["conv_b"]["bias"], np.float32)
    w1 = jnp.asarray(ka.transpose(0, 1, 3, 2).reshape(
        9, ka.shape[3], ka.shape[2]), dtype)                 # [9, Cmid, Cin]
    b1 = jnp.asarray(ba[:, None], jnp.float32)
    w2 = jnp.asarray(kb[0, 0].T, dtype)                      # [Cout, Cmid]
    b2 = jnp.asarray(bb[:, None], jnp.float32)
    return w1, b1, w2, b2


def _pick_k_rows(cin: int, cmid: int, cout: int, wp: int,
                 itemsize: int = 2, acc_shift: bool = False,
                 has_residual: bool = False) -> int:
    """Largest band height whose kernel working set fits scoped VMEM.

    Per band: 3 row-band inputs (double-buffered by the Pallas pipeline),
    the ext concat (+2 halo rows), fp32 accumulator + compute-dtype hidden
    (acc_shift keeps THREE fp32 accumulators live through the dx combine),
    and the fp32 out + double-buffered out block.  Budget 14 MB of the
    16 MB scoped-vmem limit (the 64→16 dec_final block at Wp=1024 measures
    26 MB at k_rows=16 — a fixed 16 OOMs inside the full model)."""
    budget = 14 * 1024 * 1024
    n_acc = 3 if acc_shift else 1
    for k in (32, 16, 8, 4, 2, 1):
        band = 3 * 2 * cin * k * wp * itemsize
        ext = cin * (k + 2) * wp * itemsize
        mid = cmid * k * wp * (n_acc * 4 + itemsize)
        out = cout * k * wp * (4 + 2 * itemsize)
        if has_residual:  # double-buffered skip band streamed like out
            out += cout * k * wp * 2 * itemsize
        if band + ext + mid + out <= budget:
            return k
    return 1


@functools.partial(jax.jit, static_argnames=("k_rows", "negative_slope",
                                             "interpret", "stack_taps",
                                             "acc_shift", "rowpack"))
def fused_conv_block_nhwc(x: jax.Array, w1, b1, w2, b2, *,
                          k_rows: int | None = None,
                          negative_slope: float = 0.2,
                          interpret: bool = False,
                          stack_taps: bool = False,
                          acc_shift: bool = False,
                          rowpack: bool = False) -> jax.Array:
    """NHWC convenience wrapper: [N,H,W,Cin] → [N,H,W,Cout].  Pads W to the
    lane multiple and H to the band multiple, transposes to channels-major,
    runs the fused kernel, and transposes back (the transposes are XLA
    relayouts; benchmark inclusive of them).  ``k_rows=None`` picks the
    largest VMEM-fitting band height."""
    n, h, w, cin = x.shape
    wp = (w // 128 + 1) * 128
    if k_rows is None:
        k_rows = _pick_k_rows(cin, w1.shape[1], w2.shape[0], wp,
                              itemsize=x.dtype.itemsize,
                              acc_shift=acc_shift)
    hp = ((h + k_rows - 1) // k_rows) * k_rows
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    xc = x.transpose(0, 3, 1, 2)
    out = fused_conv_block_chw(xc, w1, b1, w2, b2, k_rows=k_rows,
                               negative_slope=negative_slope,
                               interpret=interpret, stack_taps=stack_taps,
                               acc_shift=acc_shift, rowpack=rowpack)
    return out.transpose(0, 2, 3, 1)[:, :h, :w, :]
