"""Channels-major end-to-end deployment forward (the 2K transpose-floor fix).

The mixed NHWC model (models/unet.py) routes each small-channel block
through the fused channels-major Pallas kernel via an NHWC wrapper that
pads + transposes in and transposes + slices out — a pad/relayout pair
per block invocation that the round-3 floor bench measured at ~0.5 ms per
call at 2K shapes (core 1.46 ms vs nhwc_total 1.94 ms).  The trimmed net
pays it at every fused block, so at 2048×1024 several milliseconds of the
9-10 ms frame are pure layout traffic.

This engine keeps the activation tensor in the kernels' native layout —
``[N, C, H, Wp]`` with W zero-padded to the lane multiple — through the
ENTIRE forward:

- entry: one fused unshuffle+transpose+pad producing [N, in_ch·4, H/2, Wp]
- fused ConvBlocks run ``fused_conv_block_chw`` directly (no wrapper)
- pool / upsample / head-resize / skip-adds operate on the padded
  channels-major tensor (the resize matrices are zero-padded so pad
  columns stay zero through the contraction)
- pad columns are re-zeroed inside each kernel's epilogue (the SAME-
  padding trick needs zero pads on input; the in-register mask replaces
  what used to be a separate full-tensor masking pass), and the decoder
  skip-adds ride the same epilogue (``residual=`` operand) instead of
  costing a read+read+write XLA pass per level
- blocks with no channels-major kernel (the wide ≥128-in stages) run in a
  local NHWC interlude at the net's SMALL spatial levels, where the
  transpose pair is cheap
- exit: one fused slice+shuffle+transpose+sigmoid back to [N, H, W, out]

Semantics match ``UNet.apply`` at inference (normalization='none', i.e.
BN-folded params — models/fold_bn.py) to float-noise level; pinned by
tests/test_chw_engine.py.  Reference semantics chain: Unetmodel.py:90-149.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pcss_unet_tpu.models.unet import widths_from_params
from pcss_unet_tpu.ops.pallas.convblock import fused_conv_block_chw
from pcss_unet_tpu.ops.resize import (banded_apply, compose_resize_matrices,
                                      interp_matrix)


def _wp(w: int) -> int:
    """Lane-padded width: next multiple of 128 with ≥1 zero pad column."""
    return (w // 128 + 1) * 128


def _pad_matrix(m: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Embed [out,in] into [rows,cols]: zero rows → zero pad outputs, zero
    cols → pad-column garbage in the input cannot leak in."""
    out = np.zeros((rows, cols), np.float32)
    out[:m.shape[0], :m.shape[1]] = m
    return out


def _entry_chw(x: jax.Array, dtype) -> jax.Array:
    """[N,H,W,C] → pixel-unshuffled, channels-major, lane-padded
    [N, C·4, H/2, Wp] (torch pixel_unshuffle channel order c·4+dy·2+dx,
    Unetmodel.py:65-67)."""
    n, h, w, c = x.shape
    x = x.astype(dtype)
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)       # [N,H',dy,W',dx,C]
    x = x.transpose(0, 5, 2, 4, 1, 3)               # [N,C,dy,dx,H',W']
    x = x.reshape(n, c * 4, h // 2, w // 2)
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, _wp(w // 2) - w // 2)))


def _exit_nhwc(x: jax.Array, w: int, out_ch: int) -> jax.Array:
    """[N, out·4, H', Wp] → slice true W', pixel-shuffle (inverse channel
    order), → [N, H, W, out] with sigmoid (Unetmodel.py:86, 148)."""
    n, c4, hh, wp = x.shape
    x = x[..., :w // 2]
    x = x.reshape(n, out_ch, 2, 2, hh, w // 2)      # [N,C,dy,dx,H',W']
    x = x.transpose(0, 4, 2, 5, 3, 1)               # [N,H',dy,W',dx,C]
    x = x.reshape(n, hh * 2, w, out_ch)
    return jax.nn.sigmoid(x.astype(jnp.float32))


def _pool2x_chw(x: jax.Array, w: int) -> jax.Array:
    """2×2 average pool on the padded channels-major tensor; repads to the
    half-width lane multiple.  Pad columns are zero on input (masked), so
    pooled pads stay zero."""
    n, c, h, wp = x.shape
    x = x.reshape(n, c, h // 2, 2, wp // 2, 2).mean((3, 5))
    half = w // 2
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, _wp(half) - wp // 2)))


# ---------------------------------------------------------------------------
# MXU-banded layout movers (round 5).  The r5b per-stage breakdown measured
# the XLA lowerings of the pure-layout stages as the w16 2K frame's dominant
# cost — entry unshuffle 3.14 ms of the 6.0 ms frame, pool_0 1.16 ms,
# head+exit 0.69 ms (logs/bench_stages_r5b.jsonl) — because each is a
# lane-crossing shuffle XLA lowers as scalar-ish copies.  The TPU-native
# move: express the lane permutation as a contraction with a static one-hot
# banded matrix and ride the MXU (ops/resize.banded_apply), keeping every
# other dimension's movement lane-preserving (major-dim transposes, which
# XLA lowers as row copies).  One-hot bf16 matmuls with f32 accumulation
# are EXACT — each output is a single product by 1.0 — so these are
# bit-identical to the reshape/transpose path, pinned by test_chw_engine.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _entry_perm_matrix(w: int, c: int) -> np.ndarray:
    """[G·8·128, W·C] one-hot: out lane (g, p=(ci·2+dx), t) ← in lane
    (2·(g·128+t)+dx)·C + ci for g·128+t < W/2; rows past W/2 stay zero,
    which materializes the lane padding for free."""
    w2 = w // 2
    wp = _wp(w2)
    g_blocks = wp // 128
    out = np.arange(g_blocks * 2 * c * 128)
    g, rem = out // (2 * c * 128), out % (2 * c * 128)
    p, t = rem // 128, rem % 128
    ci, dx = p // 2, p % 2
    wprime = g * 128 + t
    valid = wprime < w2
    m = np.zeros((len(out), w * c), np.float32)
    m[out[valid], (2 * wprime[valid] + dx[valid]) * c + ci[valid]] = 1.0
    return m


def _entry_chw_mxu(x: jax.Array, dtype) -> jax.Array:
    """Same contract as :func:`_entry_chw`, as a banded MXU contraction.
    The only lane-crossing step is the one-hot matmul; the dy/channel
    splits are lane-preserving reshapes/major transposes."""
    n, h, w, c = x.shape
    wp = _wp(w // 2)
    xb = x.astype(dtype).reshape(n * h, w * c)
    y = banded_apply(xb, _entry_perm_matrix(w, c), axis=1, align=128)
    y = y.reshape(n, h // 2, 2, wp // 128, c, 2, 128)  # (h2,dy,g,ci,dx,t)
    y = y.transpose(0, 4, 2, 5, 1, 3, 6)               # (ci,dy,dx,h2,g,t)
    return y.reshape(n, c * 4, h // 2, wp)


@functools.lru_cache(maxsize=64)
def _exit_perm_matrix(w: int, wp: int, out_ch: int, dx: int) -> np.ndarray:
    """[W·out_ch, out_ch·Wp] one-hot for the dx half of the exit lane
    interleave: out lane w_full·out_ch + c ← in lane c·Wp + w' where
    w_full = 2·w' + dx."""
    w2 = w // 2
    m = np.zeros((w * out_ch, out_ch * wp), np.float32)
    wprime = np.arange(w2)
    for cc in range(out_ch):
        m[(2 * wprime + dx) * out_ch + cc, cc * wp + wprime] = 1.0
    return m


def _exit_nhwc_mxu(x: jax.Array, w: int, out_ch: int) -> jax.Array:
    """Same contract as :func:`_exit_nhwc`: [N, out·4, H', Wp] →
    [N, H, W, out] + sigmoid, with the dx lane interleave on the MXU."""
    n, c4, hh, wp = x.shape
    x = x.reshape(n, out_ch, 2, 2, hh, wp)         # (c, dy, dx, h2, wp)
    x = x.transpose(0, 4, 2, 1, 3, 5)              # (n, h2, dy, c, dx, wp)
    rows = n * hh * 2
    z = x.reshape(rows, out_ch, 2, wp)
    out = (banded_apply(z[:, :, 0].reshape(rows, out_ch * wp),
                        _exit_perm_matrix(w, wp, out_ch, 0), axis=1,
                        align=128)
           + banded_apply(z[:, :, 1].reshape(rows, out_ch * wp),
                          _exit_perm_matrix(w, wp, out_ch, 1), axis=1,
                          align=128))
    out = out.reshape(n, hh * 2, w, out_ch)
    return jax.nn.sigmoid(out.astype(jnp.float32))


@functools.lru_cache(maxsize=64)
def _pool_matrices(h: int, w: int, wp: int) -> tuple[np.ndarray, np.ndarray]:
    half = w // 2
    wp2 = _wp(half)
    m_h = np.zeros((h // 2, h), np.float32)
    r = np.arange(h // 2)
    m_h[r, 2 * r] = 0.5
    m_h[r, 2 * r + 1] = 0.5
    m_w = np.zeros((wp2, wp), np.float32)
    q = np.arange(half)
    m_w[q, 2 * q] = 0.5
    m_w[q, 2 * q + 1] = 0.5                    # rows ≥ half stay zero: pads
    return m_h, m_w


def _pool2x_chw_mxu(x: jax.Array, w: int) -> jax.Array:
    """Same contract as :func:`_pool2x_chw` via two banded contractions
    (H rows then W lanes).  0.5·(a+b) twice with f32 accumulation equals
    the 4-tap mean up to bf16 rounding of the intermediate."""
    n, c, h, wp = x.shape
    m_h, m_w = _pool_matrices(h, w, wp)
    x = banded_apply(x, m_h, axis=2, align=8)
    return banded_apply(x, m_w, axis=3, align=128)


def _block_chw_einsum(x, params, *, dtype, residual=None):
    """Wide (≥128-in) ConvBlock computed channels-major as nine shifted
    channel contractions — MXU-native, NO layout interlude.  The NHWC
    interlude pays a transpose pair per wide stage (r5b breakdown:
    enc_3 0.70 ms, dec_0 0.33 ms at w16-2K shapes, mostly relayout);
    this form keeps [N, C, H, Wp] throughout: a 3×3 SAME conv is
    Σ_ky,kx W1[ky,kx] ⊗ shift(x), each term an einsum over C, and the
    1×1 is a single contraction.  Semantics = ConvBlock (folded BN):
    leaky(conv1×1(leaky(conv3×3+b1))+b2), Unetmodel.py:21-38.

    Output pad columns are NOT zero (the kx shifts smear edge values
    into them) — every downstream consumer is a banded matrix with zero
    input-pad columns (pools/upsample/head-resize), which filters them;
    chw kernels never directly consume a wide stage in the U-Net
    topology (wide stages are followed by pool/upsample)."""
    ka = params["conv_a"]["kernel"].astype(dtype)      # [3,3,Cin,Cmid] HWIO
    b1 = params["conv_a"]["bias"].astype(jnp.float32)[None, :, None, None]
    w2 = params["conv_b"]["kernel"][0, 0].astype(dtype)
    b2 = params["conv_b"]["bias"].astype(jnp.float32)[None, :, None, None]
    n, cin, h, wp = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    mid = None
    for ky in range(3):
        for kx in range(3):
            t = jax.lax.slice(xp, (0, 0, ky, kx), (n, cin, ky + h, kx + wp))
            term = jnp.einsum("cm,nchw->nmhw", ka[ky, kx], t,
                              preferred_element_type=jnp.float32)
            mid = term if mid is None else mid + term
    mid = mid + b1
    mid = jnp.where(mid >= 0, mid, mid * 0.2).astype(dtype)
    out = jnp.einsum("cm,nchw->nmhw", w2, mid,
                     preferred_element_type=jnp.float32) + b2
    out = jnp.where(out >= 0, out, out * 0.2).astype(dtype)
    return out if residual is None else out + residual


def _resize_chw(x: jax.Array, m_h: np.ndarray, m_w_padded: np.ndarray,
                dtype) -> jax.Array:
    """Apply per-axis align-corners matrices to [N,C,H,Wp].  ``m_w_padded``
    is already lane-padded (zero rows/cols) so the output keeps zero pads.
    Both contractions run BANDED (ops/resize.banded_apply): the matrices
    have ≤4 nonzeros per row, so per-128-output-block dense dots over each
    block's aligned nonzero window cut the streamed MXU work ~3-8× exactly
    (the skipped terms are zeros)."""
    if m_h is not None:
        x = banded_apply(x, m_h, axis=2, align=8)
    if m_w_padded is not None:
        x = banded_apply(x, m_w_padded, axis=3, align=128)
    return x


def _upsample2x_chw(x: jax.Array, w: int, dtype) -> jax.Array:
    n, c, h, wp = x.shape
    m_h = interp_matrix(h, h * 2)
    m_w = _pad_matrix(interp_matrix(w, w * 2), _wp(w * 2), wp)
    return _resize_chw(x, m_h, m_w, dtype)


def _block_chw(x, params, w, *, taps: str, dtype, interpret: bool,
               residual=None):
    """Folded ConvBlock through the channels-major kernel, no wrapper.

    Pad-column re-zeroing and the additive skip both run in the kernel's
    epilogue (fused_conv_block_chw ``true_w``/``residual``) — each would
    otherwise be a separate full read+write XLA pass over the tensor."""
    ka = params["conv_a"]["kernel"].astype(dtype)      # [3,3,Cin,Cmid] HWIO
    w1 = ka.transpose(0, 1, 3, 2).reshape(9, ka.shape[3], ka.shape[2])
    w2 = params["conv_b"]["kernel"][0, 0].T.astype(dtype)
    b1 = params["conv_a"]["bias"].astype(jnp.float32)[:, None]
    b2 = params["conv_b"]["bias"].astype(jnp.float32)[:, None]
    from pcss_unet_tpu.ops.pallas.convblock import _pick_k_rows, rowpack_r

    if taps == "rowpack" and rowpack_r(ka.shape[2], ka.shape[3],
                                       w2.shape[0]) < 2:
        taps = "stack"   # r=1 degenerates to a per-row unrolled loop

    n, cin, h, wp = x.shape
    k_rows = _pick_k_rows(cin, w1.shape[1], w2.shape[0], wp,
                          itemsize=jnp.dtype(dtype).itemsize,
                          acc_shift=taps == "acc_shift",
                          has_residual=residual is not None)
    while h % k_rows:
        k_rows //= 2
    return fused_conv_block_chw(x.astype(dtype), w1, b1, w2, b2,
                                k_rows=k_rows, negative_slope=0.2,
                                interpret=interpret,
                                stack_taps=("chunk128" if taps == "chunk128"
                                            else taps == "stack"),
                                acc_shift=taps == "acc_shift",
                                rowpack=taps == "rowpack",
                                true_w=w,
                                residual=None if residual is None
                                else residual.astype(dtype))


def _block_nhwc_plain(x, params, dtype):
    """Folded ConvBlock as plain XLA NHWC convs (wide stages; the NHWC
    interlude).  LeakyReLU(conv1×1(LeakyReLU(conv3×3(x)+b1))+b2)."""
    dn = jax.lax.conv_dimension_numbers(x.shape,
                                        params["conv_a"]["kernel"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(
        x.astype(dtype), params["conv_a"]["kernel"].astype(dtype),
        (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    h = h + params["conv_a"]["bias"].astype(jnp.float32)
    h = jnp.where(h >= 0, h, h * 0.2).astype(dtype)
    out = jnp.einsum("nhwc,co->nhwo", h,
                     params["conv_b"]["kernel"][0, 0].astype(dtype),
                     preferred_element_type=jnp.float32)
    out = out + params["conv_b"]["bias"].astype(jnp.float32)
    return jnp.where(out >= 0, out, out * 0.2).astype(dtype)


def _block_nhwc_dispatch(x, params, *, dtype, int8: bool, taps: str,
                         interpret: bool):
    """NHWC-interlude block dispatch mirroring ConvBlock's deployment gates
    (models/unet.py:_int8able/_fusable128): int8 whole-block kernels for
    the MXU-bound ≥256-in stages, the NHWC-native 128-kernel when it fits,
    plain XLA otherwise."""
    cin = x.shape[-1]
    cout = params["conv_b"]["kernel"].shape[-1]
    from pcss_unet_tpu.ops.pallas import pallas_available

    have_pallas = interpret or pallas_available()
    if (int8 and have_pallas and cin >= 256
            and (cin * cout < 2 ** 18 or cin >= 1024)):
        from pcss_unet_tpu.ops.int8 import quantize_kernel_int8
        from pcss_unet_tpu.ops.pallas.block_int8 import (
            fused_block_int8_kchunked, fused_block_int8_nhwc,
            pick_k_rows_int8, pick_kchunked,
        )

        k = pick_k_rows_int8(x.shape[1], x.shape[2], cin, cout)
        kc = None if k else pick_kchunked(x.shape[1], x.shape[2], cin, cout)
        if k or kc:
            w1q, s1 = quantize_kernel_int8(params["conv_a"]["kernel"])
            w2q, s2 = quantize_kernel_int8(params["conv_b"]["kernel"])
            args = (x.astype(dtype), w1q.reshape(9, *w1q.shape[2:]), s1,
                    params["conv_a"]["bias"].astype(jnp.float32),
                    w2q[0, 0], s2,
                    params["conv_b"]["bias"].astype(jnp.float32))
            if k:
                return fused_block_int8_nhwc(*args, k_rows=k,
                                             negative_slope=0.2,
                                             interpret=interpret)
            return fused_block_int8_kchunked(*args, k_rows=kc[0],
                                             c_chunk=kc[1],
                                             negative_slope=0.2,
                                             interpret=interpret)
    if have_pallas and cin == 128 and cout <= 128:
        from pcss_unet_tpu.ops.pallas.convblock128 import (
            fused_block128_nhwc, pick_k_rows_128,
        )

        k = pick_k_rows_128(x.shape[1], x.shape[2], cin, cout)
        if k:
            ka = params["conv_a"]["kernel"].astype(dtype)
            return fused_block128_nhwc(
                x.astype(dtype), ka.reshape(9, *ka.shape[2:]),
                params["conv_a"]["bias"].astype(jnp.float32),
                params["conv_b"]["kernel"][0, 0].astype(dtype),
                params["conv_b"]["bias"].astype(jnp.float32),
                k_rows=k, negative_slope=0.2, interpret=interpret)
    return _block_nhwc_plain(x, params, dtype)


def _to_nhwc(x: jax.Array, w: int) -> jax.Array:
    return x[..., :w].transpose(0, 2, 3, 1)


def _to_chw(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    x = x.transpose(0, 3, 1, 2)
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, _wp(w) - w)))


def _chw_fusable(cin: int, cout: int, use128: bool) -> bool:
    """Which blocks stay channels-major: the ≤64-in stages the kernel wins
    outright, plus (``use128``) the 128-in stages where the core only ties
    XLA but staying in layout saves the transpose pair."""
    if cin <= 64 and cout <= 128:
        return True
    return use128 and cin == 128 and cout <= 128


def chw_forward(variables: dict, x: jax.Array, *,
                dtype: Any = jnp.bfloat16, int8: bool = False,
                taps: str | dict = "stack", use128_chw: bool = True,
                movers: str = "mxu", wide: str = "auto",
                interpret: bool = False) -> jax.Array:
    """Channels-major inference forward, semantics-equal to
    ``UNet(normalization='none', ...).apply(variables, x, False)`` on
    BN-folded params.  x [N,H,W,in_ch] with H, W even and pooling-aligned
    (pad first — infer/frame.py's engine already pads to ×16).

    ``movers`` picks the implementation of the pure-layout stages (entry
    unshuffle, 2× pools, exit interleave): ``"mxu"`` (default) runs them
    as banded one-hot contractions on the MXU — the r5b stage breakdown
    measured the ``"xla"`` reshape/transpose lowerings at over half the
    w16 2K frame (entry alone 3.14 ms of 6.0) — ``"xla"`` keeps the
    plain lowerings as the reference/fallback path.

    ``wide`` picks the wide (no channels-major kernel) stages' path:
    ``"auto"`` (default) runs them channels-major as shifted MXU
    contractions (:func:`_block_chw_einsum`, no transpose interlude)
    except where the int8 whole-block NHWC kernels would engage;
    ``"einsum"``/``"nhwc"`` force one path."""
    params = variables["params"]
    widths, in_ch, out_ch = widths_from_params(params)
    n, h, w, c = x.shape
    depth = len(widths)
    align = 2 ** depth
    if h % align or w % align:
        raise ValueError(f"chw_forward needs H,W divisible by {align} "
                         f"(got {h}x{w}); pad at the pipeline edge")
    if movers not in ("mxu", "xla"):
        raise ValueError(f"movers must be 'mxu' or 'xla', got {movers!r}")
    if wide not in ("auto", "einsum", "nhwc"):
        raise ValueError(f"wide must be auto/einsum/nhwc, got {wide!r}")
    mxu = movers == "mxu"
    entry = _entry_chw_mxu if mxu else _entry_chw
    pool = _pool2x_chw_mxu if mxu else _pool2x_chw
    exit_ = _exit_nhwc_mxu if mxu else _exit_nhwc

    x = entry(x, dtype)                      # [N, in·4, H/2, Wp]
    cur_w = w // 2
    kw = dict(dtype=dtype, interpret=interpret)

    def any_block(x, name, cur_w, residual=None):
        p = params[name]
        cin = p["conv_a"]["kernel"].shape[2]
        cout = p["conv_b"]["kernel"].shape[-1]
        # per-stage tap strategy: a dict maps stage name -> strategy
        # ("*" = default) — the r5b A/B showed no single strategy wins
        # every stage (chunk128 takes dec_final 0.073 vs 0.214 ms but
        # loses enc_1 0.66 vs 0.13; logs/bench_stages_r5b.jsonl)
        t = (taps.get(name, taps.get("*", "stack"))
             if isinstance(taps, dict) else taps)
        if _chw_fusable(cin, cout, use128_chw):
            return _block_chw(x, p, cur_w, taps=t, residual=residual,
                              **kw)
        # int8 whole-block kernels are NHWC-native and win on the
        # MXU-bound wide stages (the w64 posture) — keep the interlude
        # for stages where they engage; otherwise stay channels-major.
        from pcss_unet_tpu.ops.pallas import pallas_available

        int8_stage = (int8 and (interpret or pallas_available())
                      and cin >= 256
                      and (cin * cout < 2 ** 18 or cin >= 1024))
        if wide == "einsum" or (wide == "auto" and not int8_stage):
            return _block_chw_einsum(x, p, dtype=dtype, residual=residual)
        out = _block_nhwc_dispatch(_to_nhwc(x, cur_w), p, int8=int8,
                                   taps=t, **kw)
        out = _to_chw(out)
        return out if residual is None else out + residual

    skips = []
    for i in range(depth - 1):
        x = any_block(x, f"enc_{i}", cur_w)
        skips.append((x, cur_w))
        x = pool(x, cur_w)
        cur_w //= 2
    x = any_block(x, f"enc_{depth - 1}", cur_w)

    for i, (skip, skip_w) in enumerate(reversed(skips)):
        x = _upsample2x_chw(x, cur_w, dtype)
        cur_w *= 2
        x = any_block(x, f"dec_{i}", cur_w, residual=skip)

    # head: composed up-2×-then-match-down align-corners pair
    # (Unetmodel.py:140-141; exact fold, models/unet.py fold_head_resize)
    hh = x.shape[2]
    m_h, m_w = compose_resize_matrices((hh, hh * 2, hh),
                                       (cur_w, cur_w * 2, cur_w))
    wp = x.shape[-1]
    x = _resize_chw(x, m_h, _pad_matrix(m_w, wp, wp), dtype)
    x = any_block(x, "dec_final", cur_w)
    # 1×1 head conv as a channel contraction
    hk = params["head"]["kernel"][0, 0].astype(dtype)     # [Cin, out·4]
    x = jnp.einsum("oc,nchw->nohw", hk.T, x,
                   preferred_element_type=jnp.float32)
    x = x + params["head"]["bias"].astype(jnp.float32)[None, :, None, None]
    x = x.astype(dtype)
    return exit_(x, w, out_ch)
