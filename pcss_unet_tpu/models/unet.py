"""Bandwidth-optimized shadow U-Net in Flax, NHWC, TPU-first.

Capability-equivalent to the reference ``Unetmodel.py``:

- pixel-unshuffle front end: [B,H,W,4] → [B,H/2,W/2,16] (Unetmodel.py:65-67)
- encoder of ``ConvBlock`` (3×3 conv → norm → act → spatial dropout → 1×1
  conv → norm → act; reference ``DoubleConv`` Unetmodel.py:17-33) with 2×2
  average-pool downsampling (Unetmodel.py:40-46)
- gradient-checkpointed bottleneck (``nn.remat``; reference
  ``torch.utils.checkpoint`` at Unetmodel.py:114-116)
- decoder with align-corners bilinear 2× upsampling, conv block, then
  **additive** skip connections (Unetmodel.py:121-137: ``up + skip``)
- 1×1 head to ``out_ch·4`` channels, pixel-shuffle reconstruction, sigmoid
  (Unetmodel.py:139-149)
- odd-size inputs fixed by align-corners bilinear resize at trace time
  (Unetmodel.py:93-97)

Differences by design (TPU-first, documented per SURVEY.md §7):

- NHWC layout end to end (MXU/XLA-native) instead of NCHW.
- ``encoder_widths`` generalizes the fixed 64/128/512/1024 ladder
  (Unetmodel.py:39-48) to the paper's 3/5/7-level depth study
  (paper.md:179-203) and wide variants.
- The reference's ``DoubleConv`` accepts a ``dilation`` argument and silently
  never applies it (Unetmodel.py:18-26, SURVEY.md §7 defect list); here
  ``apply_dilation=True`` actually dilates the encoder 3×3 convs, default
  False for parity.
- compute dtype is configurable (bf16 default); normalization statistics are
  always computed in fp32.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcss_unet_tpu.ops import (
    avg_pool_2x,
    pixel_shuffle_nhwc,
    pixel_shuffle_nhwc_mxu,
    pixel_unshuffle_nhwc,
    pixel_unshuffle_nhwc_mxu,
    resize_bilinear_align_corners,
    upsample2x_align_corners,
)
from pcss_unet_tpu.ops.resize import (
    compose_resize_matrices,
    resize_rows_window,
    resize_with_matrices,
    upsample2x_window,
)

Dtype = Any


def _activation(name: str) -> Callable[[jax.Array], jax.Array]:
    # reference: LeakyReLU(0.2) (Unetmodel.py:23, 28); config key
    # ``activation`` (config.ini:7)
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return nn.gelu
    raise ValueError(f"unknown activation: {name}")


class ConvBlock(nn.Module):
    """3×3 conv → norm → act → spatial dropout → 1×1 conv → norm → act.

    Mirrors reference ``DoubleConv`` (Unetmodel.py:17-33): the 3×3 conv keeps
    the channel count, the 1×1 conv changes it; BatchNorm eps 1e-5, torch
    momentum 0.1 (== flax momentum 0.9); LeakyReLU(0.2); Dropout2d (whole
    feature maps) after the first activation only.
    """

    features: int
    dropout_rate: float = 0.2
    dilation: int = 1
    apply_dilation: bool = False
    activation: str = "leaky_relu"
    normalization: str = "batch_norm"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    # Deployment fast path: run the whole folded-BN block through the fused
    # Pallas kernel (ops/pallas/convblock.py) — measured 1.9-4.3× faster
    # than the XLA composition for the ≤64-channel stages at 544×960
    # (docs/BENCHMARKS.md).  Only taken at eval with normalization 'none'
    # (i.e. after fold_batchnorm) and leaky_relu; param tree is unchanged.
    fused_inference: bool = False
    pallas_interpret: bool = False   # CI: run the kernel interpreted on CPU
    # Deployment int8 path for the MXU-bound ≥128-channel stages: dynamic
    # per-tensor activation scales + per-output-channel weight scales,
    # int8×int8→int32 convs on the v5e int8 MXU (measured 1.67× over bf16
    # at the 512-channel decoder shape, docs/BENCHMARKS.md).  Disjoint from
    # the fused-Pallas gate (cin ≤ 64); param tree unchanged (weights
    # quantize in-graph — a few MB re-read per forward, noise vs the win).
    int8_inference: bool = False

    def _norm(self, name: str) -> Callable:
        if self.normalization == "batch_norm":
            return nn.BatchNorm(
                use_running_average=None,  # set via call-time arg
                momentum=0.9,              # torch momentum 0.1 ≡ flax 0.9
                epsilon=1e-5,
                # stats in fp32 for bf16 stability; promote keeps an f64
                # net (training-parity tests) fully f64
                dtype=jnp.promote_types(jnp.float32, self.dtype),
                param_dtype=self.param_dtype,
                axis_name=self.bn_axis_name,
                name=name,
            )
        if self.normalization == "group_norm":
            return nn.GroupNorm(num_groups=None, group_size=16, epsilon=1e-5,
                                dtype=jnp.float32, param_dtype=self.param_dtype,
                                name=name)
        if self.normalization == "instance_norm":
            # per-sample, per-channel spatial norm
            return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                                dtype=jnp.float32, param_dtype=self.param_dtype,
                                name=name)
        if self.normalization == "none":
            return lambda x, **kw: x
        raise ValueError(f"unknown normalization: {self.normalization}")

    def _apply_norm(self, norm, x, train: bool):
        if self.normalization == "batch_norm":
            return norm(x, use_running_average=not train)
        if self.normalization == "none":
            return x
        return norm(x)

    def _fusable128(self, x: jax.Array, train: bool) -> bool:
        # NHWC-native whole-block kernel for the 128-channel stages
        # (ops/pallas/convblock128.py; dec_2 at 544×960 measures 1.29× —
        # the hidden activation never leaves VMEM).  Shape constraints are
        # checked via pick_k_rows_128 at trace time.
        return (self.fused_inference and not train
                and self.normalization == "none"
                and self.activation == "leaky_relu"
                and not self.apply_dilation
                and x.shape[-1] == 128 and self.features <= 128)

    def _fusable(self, x: jax.Array, train: bool) -> bool:
        # cin ≤ 64: where XLA leaves the bandwidth gap (measured speedups
        # 1.09-1.29×, docs/BENCHMARKS.md "Pallas fused ConvBlock"); at
        # cin=128 the kernel only ties XLA (1.00×), so stop there.  cout ≤
        # 128 keeps the per-band VMEM working set fitting via the adaptive
        # band height (ops/pallas/convblock.py:_pick_k_rows).
        return (self.fused_inference and not train
                and self.normalization == "none"
                and self.activation == "leaky_relu"
                and not self.apply_dilation
                and x.shape[-1] <= 64 and self.features <= 128)

    def _int8able(self, x: jax.Array, train: bool) -> bool:
        # cin ≥ 256: only the genuinely MXU-bound blocks.  The 128-channel
        # stages are bandwidth-bound — dynamic quantization there ADDS
        # full-frame passes and measured a net loss.  int8 runs ONLY via
        # the whole-block Pallas kernel (bf16 at every boundary): XLA int8
        # convs were measured and RETIRED from the model — any XLA int8 op
        # whose consumer chain reaches a Pallas custom call triggers a
        # pathological layout interaction (69 ms/frame vs 18;
        # BENCHMARKS.md "int8 serving"), and the kernels-only posture
        # benches fastest (55.3 vs 50.4 fps).
        return (self.int8_inference and not train
                and self.normalization == "none"
                and self.activation == "leaky_relu"
                and not self.apply_dilation
                and x.shape[-1] >= 256
                # dec_1 class (wide-in/narrow-out) and dec_0 class
                # (≥1024-in, k-chunked kernel).  enc_3 (512→…→1024) stays
                # on the plain bf16 path: routing it through the kernel
                # measures 54.2 fps vs 55.3 — its standalone win (1.30→
                # 1.15 ms) does not survive the extra custom call.
                and (x.shape[-1] * self.features < 2 ** 18
                     or x.shape[-1] >= 1024))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        act = _activation(self.activation)
        in_ch = x.shape[-1]
        dil = self.dilation if self.apply_dilation else 1
        conv_a = nn.Conv(in_ch, (3, 3), padding="SAME",
                         kernel_dilation=(dil, dil),
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="conv_a")
        conv_b = nn.Conv(self.features, (1, 1),
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="conv_b")
        if self._int8able(x, train):
            # whole-block int8 Pallas kernel (bf16 at every boundary;
            # dec_1 5.71 → 3.31 ms standalone).  Blocks it cannot fit
            # (dec_0's 1024-ch weights exceed VMEM) stay on the exact bf16
            # float path — measured faster than XLA int8 there once any
            # Pallas custom call exists downstream (BENCHMARKS.md).
            from pcss_unet_tpu.ops.int8 import quantize_kernel_int8
            from pcss_unet_tpu.ops.pallas import pallas_available
            from pcss_unet_tpu.ops.pallas.block_int8 import (
                fused_block_int8_kchunked, fused_block_int8_nhwc,
                pick_k_rows_int8, pick_kchunked,
            )

            k = pick_k_rows_int8(x.shape[1], x.shape[2], in_ch,
                                 self.features)
            kc = (None if k else
                  pick_kchunked(x.shape[1], x.shape[2], in_ch,
                                self.features))
            if (k or kc) and (self.pallas_interpret or pallas_available()):
                probe = jnp.zeros((1, 1, 1, in_ch), self.dtype)
                conv_b(conv_a(probe))
                pa = conv_a.variables["params"]
                pb = conv_b.variables["params"]
                w1q, s1 = quantize_kernel_int8(pa["kernel"])
                w2q, s2 = quantize_kernel_int8(pb["kernel"])
                args = (x.astype(self.dtype),
                        w1q.reshape(9, *w1q.shape[2:]), s1,
                        pa["bias"].astype(jnp.float32),
                        w2q[0, 0], s2, pb["bias"].astype(jnp.float32))
                if k:
                    return fused_block_int8_nhwc(
                        *args, k_rows=k, negative_slope=0.2,
                        interpret=self.pallas_interpret)
                # dec_0 class: weights exceed VMEM in one piece → the
                # contraction-chunked variant (5.16 → 3.36 ms standalone)
                return fused_block_int8_kchunked(
                    *args, k_rows=kc[0], c_chunk=kc[1],
                    negative_slope=0.2, interpret=self.pallas_interpret)
            # no eligible kernel → keep the exact float path (fall through)
        if self._fusable128(x, train):
            from pcss_unet_tpu.ops.pallas import pallas_available
            from pcss_unet_tpu.ops.pallas.convblock128 import (
                fused_block128_nhwc, pick_k_rows_128,
            )

            k_rows = pick_k_rows_128(x.shape[1], x.shape[2], in_ch,
                                     self.features)
            if k_rows and (self.pallas_interpret or pallas_available()):
                probe = jnp.zeros((1, 1, 1, in_ch), self.dtype)
                conv_b(conv_a(probe))
                pa = conv_a.variables["params"]
                pb = conv_b.variables["params"]
                ka = pa["kernel"].astype(self.dtype)
                w1 = ka.reshape(9, *ka.shape[2:])
                b1 = pa["bias"].astype(jnp.float32)
                w2 = pb["kernel"][0, 0].astype(self.dtype)
                b2 = pb["bias"].astype(jnp.float32)
                return fused_block128_nhwc(
                    x.astype(self.dtype), w1, b1, w2, b2, k_rows=k_rows,
                    negative_slope=0.2, interpret=self.pallas_interpret)
        if self._fusable(x, train):
            from pcss_unet_tpu.ops.pallas.convblock import fused_conv_block_nhwc

            # materialize both convs' params on a 1-pixel probe (same param
            # tree as the unfused path), then read them for the kernel
            probe = jnp.zeros((1, 1, 1, in_ch), self.dtype)
            conv_b(conv_a(probe))
            pa = conv_a.variables["params"]
            pb = conv_b.variables["params"]
            ka = pa["kernel"].astype(self.dtype)             # [3,3,Cin,Cmid]
            w1 = ka.transpose(0, 1, 3, 2).reshape(9, ka.shape[3], ka.shape[2])
            w2 = pb["kernel"][0, 0].T.astype(self.dtype)     # [Cout, Cmid]
            b1 = pa["bias"].astype(jnp.float32)[:, None]
            b2 = pb["bias"].astype(jnp.float32)[:, None]
            # Tap strategy (measured defaults in docs/BENCHMARKS.md):
            # stack_taps = one K=9·Cin MXU contraction instead of 9 K=Cin
            # ones (1.03-1.22× over per-tap dots); acc_shift moves the dx
            # shifts onto the output accumulators.  PCSS_CONVBLOCK_TAPS
            # overrides for A/B measurement without a code change.
            import os

            strategy = os.environ.get("PCSS_CONVBLOCK_TAPS", "stack")
            if strategy == "rowpack":
                from pcss_unet_tpu.ops.pallas.convblock import rowpack_r

                if rowpack_r(ka.shape[2], ka.shape[3], w2.shape[0]) < 2:
                    strategy = "stack"   # r=1 degenerates to per-row dots
            return fused_conv_block_nhwc(
                x.astype(self.dtype), w1, b1, w2, b2,
                negative_slope=0.2, interpret=self.pallas_interpret,
                stack_taps=("chunk128" if strategy == "chunk128"
                            else strategy == "stack"),
                acc_shift=strategy == "acc_shift",
                rowpack=strategy == "rowpack")
        x = conv_a(x)
        x = self._apply_norm(self._norm("norm_a"), x, train)
        x = act(x).astype(self.dtype)
        # Dropout2d: drop whole channels per sample (broadcast over H, W);
        # reference Unetmodel.py:24
        x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        x = conv_b(x)
        x = self._apply_norm(self._norm("norm_b"), x, train)
        return act(x).astype(self.dtype)


class UNet(nn.Module):
    """Shadow-mask U-Net.  Default configuration is the reference network:
    encoder widths (64, 128, 512, 1024) on the 16-channel unshuffled input
    (Unetmodel.py:39-48), decoder widths mirroring the skips, additive merges.

    Call: ``model.apply(vars, x, train=..., rngs={'dropout': key},
    mutable=['batch_stats'])`` with x [B, H, W, in_ch] in [any range]; returns
    sigmoid mask [B, H, W, out_ch].
    """

    in_ch: int = 4
    out_ch: int = 1
    dropout_rate: float = 0.2
    encoder_widths: Sequence[int] = (64, 128, 512, 1024)
    activation: str = "leaky_relu"
    normalization: str = "batch_norm"
    apply_dilation: bool = False
    remat_bottleneck: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    # Fold the head's upsample-2×-then-match-down resize pair
    # (Unetmodel.py:140-141) into ONE contraction per axis — an exact
    # composition of the two linear maps, ~6× fewer resize FLOPs at 1080p.
    fold_head_resize: bool = True
    # Deployment fast paths (see ConvBlock.fused_inference /
    # ConvBlock.int8_inference): small-channel folded-BN blocks through the
    # fused Pallas kernel; ≥128-channel blocks through dynamic-int8 convs.
    fused_inference: bool = False
    pallas_interpret: bool = False
    int8_inference: bool = False
    # Spatially-sharded window mode (infer/tiled.py:infer_sharded_halo):
    # (global_H, global_W) at input resolution.  When set, __call__ accepts
    # ``window_offset`` (traced int32: the window's input-res row offset)
    # and every align-corners resize uses GLOBAL coefficients so the
    # window's output rows equal the corresponding rows of the full-frame
    # forward (exact outside the receptive-field margin — spatial_halo()).
    spatial_window: tuple[int, int] | None = None

    def _block(self, features, dropout, name, dilation=1):
        return ConvBlock(
            features=features,
            dropout_rate=dropout,
            dilation=dilation,
            apply_dilation=self.apply_dilation,
            activation=self.activation,
            normalization=self.normalization,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            bn_axis_name=self.bn_axis_name,
            fused_inference=self.fused_inference,
            pallas_interpret=self.pallas_interpret,
            int8_inference=self.int8_inference,
            name=name,
        )

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 window_offset=None) -> jax.Array:
        orig_dtype = x.dtype
        n, h, w, c = x.shape
        windowed = self.spatial_window is not None and window_offset is not None
        if windowed:
            if h % 2 or w % 2 or self.spatial_window[0] % 2 \
                    or self.spatial_window[1] % 2:
                raise ValueError("window mode requires even window and "
                                 "global sizes (pad first)")
            if not self.fold_head_resize:
                raise ValueError("window mode requires fold_head_resize")
        elif h % 2 or w % 2:
            # odd-size fixup, reference Unetmodel.py:93-97 (static at trace time)
            x = resize_bilinear_align_corners(x, (h - h % 2, w - w % 2))
        x = x.astype(self.dtype)
        # Inference graphs pick the shuffle twin PER NET ("auto"): the MXU
        # one-hot-contraction twins (ops/pixelshuffle.py) win where the net
        # is bandwidth-bound and the systolic array sits idle (trimmed
        # w16: 13.9 % MFU — the movers nearly halved its 2K frame), but on
        # the MXU-bound w64 reference net (~64 % MFU) the same contraction
        # COMPETES with the convs for the MXU and measured a regression
        # (16.08 vs 14.5 ms at 1080p, logs/bench_r5e.jsonl) — so wide nets
        # keep the XLA reshape form.  Training always keeps the reshape
        # form: its backward is the cheap transpose and the 2K train step
        # is HBM-tight.  PCSS_PIXELSHUFFLE=mxu|xla forces either (A/B).
        shuf_mode = os.environ.get("PCSS_PIXELSHUFFLE", "auto")
        mxu_shuf = (not train
                    and (shuf_mode == "mxu"
                         or (shuf_mode == "auto"
                             and self.encoder_widths[0] <= 32)))
        x = (pixel_unshuffle_nhwc_mxu if mxu_shuf
             else pixel_unshuffle_nhwc)(x, 2)   # [B, H/2, W/2, in_ch*4]
        unshuffled_ch = self.in_ch * 4
        # half-res window row offset (traced) for global-coefficient resizes
        a_half = None if not windowed else window_offset // 2

        widths = tuple(self.encoder_widths)
        depth = len(widths)

        # --- encoder ---
        skips: list[jax.Array] = []
        for i, width in enumerate(widths[:-1]):
            # reference encoder dilations 1,2,4 accepted-but-unused
            # (Unetmodel.py:39-45); honoured only if apply_dilation
            x = self._block(width, self.dropout_rate, f"enc_{i}",
                            dilation=2 ** i)(x, train=train)
            skips.append(x)
            x = avg_pool_2x(x)

        # --- bottleneck (grad-checkpointed, reference Unetmodel.py:114-116) ---
        # static_argnums counts Module.__call__ args with self at 0, so
        # ``train`` (a Python bool steering dropout/BN modes) is arg 2.
        block_cls = (nn.remat(ConvBlock, static_argnums=(2,))
                     if (self.remat_bottleneck and train) else ConvBlock)
        x = block_cls(
            features=widths[-1],
            dropout_rate=self.dropout_rate,
            apply_dilation=self.apply_dilation,
            activation=self.activation,
            normalization=self.normalization,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            bn_axis_name=self.bn_axis_name,
            fused_inference=self.fused_inference,
            pallas_interpret=self.pallas_interpret,
            int8_inference=self.int8_inference,
            name=f"enc_{depth-1}",
        )(x, train)

        # --- decoder: upsample → conv block → additive skip ---
        for i, skip in enumerate(reversed(skips)):
            if windowed:
                # global-coefficient upsample: align-corners weights depend
                # on the FULL frame height, not the window's (ops/resize.py)
                scale = 2 ** (depth - 1 - i)
                g_h = (self.spatial_window[0] // 2) // scale
                x = upsample2x_window(x, g_h, a_half // scale)
            else:
                x = upsample2x_align_corners(x)
            if x.shape[1:3] != skip.shape[1:3]:
                if windowed:
                    raise ValueError(
                        "window mode requires pooling-aligned sizes "
                        f"(decoder level {i}: {x.shape[1:3]} vs "
                        f"{skip.shape[1:3]})")
                # size re-match, reference Unetmodel.py:118-119
                x = resize_bilinear_align_corners(x, skip.shape[1:3])
            x = self._block(skip.shape[-1], self.dropout_rate,
                            f"dec_{i}")(x, train=train)
            x = x + skip                          # additive merge, Unetmodel.py:125

        # --- head ---
        # The reference upsamples 2× to full resolution and immediately
        # re-matches back down to the unshuffled half resolution
        # (Unetmodel.py:140-141: up9 = up(merge8); _upsample_and_match(up9, x)
        # where x is the unshuffled input).  The up-then-down composition of
        # align-corners resizes is NOT the identity, so we replicate it —
        # either folded into one exact contraction per axis, or literally.
        hh, ww = x.shape[1], x.shape[2]
        th, tw = skips[0].shape[1], skips[0].shape[2]
        if windowed:
            # composed up-2×-then-match-down with GLOBAL coefficients; the
            # window keeps its row count (global th == global hh)
            g_hh = self.spatial_window[0] // 2
            m_h_g, m_w_g = compose_resize_matrices((g_hh, g_hh * 2, g_hh),
                                                   (ww, ww * 2, tw))
            x = resize_rows_window(x, m_h_g, m_w_g, a_half, a_half)
        elif self.fold_head_resize:
            m_h, m_w = compose_resize_matrices((hh, hh * 2, th),
                                               (ww, ww * 2, tw))
            x = resize_with_matrices(x, m_h, m_w)
        else:
            x = upsample2x_align_corners(x)
            x = resize_bilinear_align_corners(x, (th, tw))
        # final decoder block runs at half dropout, reference Unetmodel.py:61
        x = self._block(unshuffled_ch, self.dropout_rate / 2, "dec_final")(
            x, train=train)
        x = nn.Conv(self.out_ch * 4, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="head")(x)
        x = (pixel_shuffle_nhwc_mxu if mxu_shuf
             else pixel_shuffle_nhwc)(x, 2)        # [B, H, W, out_ch]
        x = jax.nn.sigmoid(x.astype(jnp.float32))  # Unetmodel.py:148
        return x.astype(orig_dtype) if orig_dtype == jnp.float32 else x


def spatial_align(model: UNet) -> int:
    """Input-resolution row alignment every window offset must keep for
    window-exact sharded inference: the window start s must satisfy
    s/2 ≡ 0 (mod 2^(depth-1)) so each pooling level tiles cleanly and the
    global-coefficient resize offsets (``a_half // scale``) divide without
    truncation — i.e. s ≡ 0 (mod 2^depth).  16 for the depth-3/4 nets,
    32 for depth-5, 128 for depth-7."""
    return max(16, 2 ** len(model.encoder_widths))


def spatial_halo(model: UNet) -> int:
    """Input-resolution halo rows guaranteeing window-exact outputs under
    spatially-sharded inference (infer/tiled.py:infer_sharded_halo).

    Receptive-field radius of the trunk in half-res rows: one 3×3 conv per
    ConvBlock (radius = level scale × dilation), encoder + bottleneck +
    mirrored decoder, plus the head-resize matrix band (≤3) and dec_final's
    3×3 (1).  Doubled to input resolution and rounded up to the model's
    pooling/unshuffle alignment (``spatial_align`` — 16 only suffices
    through depth 4; deeper nets need coarser window offsets)."""
    d = len(model.encoder_widths)
    r = 0
    for k in range(d - 1):                       # encoder levels
        dil = (2 ** k) if model.apply_dilation else 1
        r += (2 ** k) * dil
    r += 2 ** (d - 1)                            # bottleneck
    r += sum(2 ** k for k in range(d - 1))       # decoder mirror
    r += 3 + 1                                   # head band + dec_final
    r *= 2                                       # half-res → input rows
    a = spatial_align(model)
    return -(-r // a) * a


def widths_from_params(params) -> tuple[tuple[int, ...], int, int]:
    """Recover ``(encoder_widths, in_ch, out_ch)`` from a parameter tree.

    The architecture is fully encoded in the checkpoint: every
    ``enc_k/conv_b`` 1x1 kernel's output dim is that level's width, the
    ``enc_0/conv_a`` input dim is the 2x2-folded input (``in_ch * 4``) and
    the head's output dim the folded mask (``out_ch * 4``).  This is what
    lets ``cli.infer`` load ANY trained checkpoint — reference ``.pth``,
    ``.npz`` export (including BN-folded), or Orbax dir — without the user
    hand-matching ``base_width``/``model_depth`` config keys, mirroring how
    the reference's fixed-architecture ``infer.py:36-41`` never asks.
    Raises ``ValueError`` when the tree is not a UNet parameter tree.
    """
    try:
        ks = sorted((k for k in params if k.startswith("enc_")),
                    key=lambda k: int(k.split("_")[1]))
        widths = tuple(int(params[k]["conv_b"]["kernel"].shape[-1])
                       for k in ks)
        folded_in = int(params["enc_0"]["conv_a"]["kernel"].shape[2])
        folded_out = int(params["head"]["kernel"].shape[-1])
    except (KeyError, TypeError, AttributeError, IndexError) as e:
        raise ValueError(f"not a UNet parameter tree: {e}") from None
    if not widths or folded_in % 4 or folded_out % 4:
        raise ValueError("not a UNet parameter tree (no encoder levels or "
                         "unfolded stem/head)")
    return widths, folded_in // 4, folded_out // 4


def unet_for_variables(cfg, variables) -> UNet:
    """Build the UNet for a loaded checkpoint: config supplies the
    non-recoverable hyperparameters (activation, dtype, ...) but the
    checkpoint is the authority on the architecture — when its recovered
    ``(widths, in_ch, out_ch)`` disagree with ``base_width``/``model_depth``
    the model is rebuilt to match (logged), so every checkpoint-consuming
    CLI loads trimmed/custom nets without hand-matched config keys."""
    model = unet_from_config(cfg)
    try:
        widths, in_ch, out_ch = widths_from_params(variables["params"])
    except (ValueError, KeyError, TypeError):
        return model  # non-UNet tree: let the caller's apply() raise
    if (widths != tuple(model.encoder_widths) or in_ch != model.in_ch
            or out_ch != model.out_ch):
        import logging
        logging.info("checkpoint architecture widths=%s in=%d out=%d "
                     "overrides config (base_width=%d, model_depth=%d)",
                     widths, in_ch, out_ch, cfg.base_width, cfg.model_depth)
        model = model.clone(encoder_widths=widths, in_ch=in_ch,
                            out_ch=out_ch)
    return model


def unet_from_config(cfg) -> UNet:
    """Build the UNet from a ``pcss_unet_tpu.config.Config``."""
    widths = {
        3: (cfg.base_width, cfg.base_width * 2, cfg.base_width * 4),
        4: (cfg.base_width, cfg.base_width * 2, cfg.base_width * 8,
            cfg.base_width * 16),
        5: (cfg.base_width, cfg.base_width * 2, cfg.base_width * 4,
            cfg.base_width * 8, cfg.base_width * 16),
        7: (cfg.base_width, cfg.base_width, cfg.base_width * 2,
            cfg.base_width * 4, cfg.base_width * 8, cfg.base_width * 8,
            cfg.base_width * 16),
    }.get(cfg.model_depth)
    if widths is None:
        raise ValueError(f"unsupported model_depth: {cfg.model_depth}")
    return UNet(
        in_ch=cfg.input_channels,
        out_ch=cfg.output_channels,
        dropout_rate=cfg.dropout_rate,
        encoder_widths=widths,
        activation=cfg.activation,
        normalization=cfg.normalization,
        apply_dilation=cfg.apply_dilation,
        dtype=jnp.dtype(cfg.compute_dtype),
        param_dtype=jnp.dtype(cfg.param_dtype),
    )
