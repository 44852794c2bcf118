"""Batched full-frame inference.

Reference inference paths: lean CLI (infer.py:22-85 — even-size fixup,
fp16 autocast, ×255 PNG) and verbose CLI (inference.py:98-311 — reflection
pad to ×16, NaN scrubbing, multi-format save).  Here both collapse into one
engine:

- static-shape discipline: frames are reflection-padded to ``pad_multiple``
  (default 16, inference.py:154-163) *outside* jit, so each padded shape
  compiles once and is cached — XLA-friendly, no dynamic shapes
- bf16 weights/compute by default (the fp16-autocast analogue), fp32 opt-in
- input standardization fused into the jitted forward when stats are given
- NaN scrub on input and output (inference.py:171-173, 200-202)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def load_variables(path: str, ema: bool = False) -> dict:
    """Load model variables from any supported checkpoint format:
    Orbax directory (ours), ``.npz`` (reference-named export), or ``.pth``
    (torch, both reference formats — infer.py:36-41).

    ``ema=True`` deploys the EMA parameters (cfg.ema_decay runs checkpoint
    them alongside the raw ones); raises if the checkpoint has none."""
    import os

    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        # A CheckpointManager ROOT (cli.train --save_dir): resolve to the
        # best checkpoint by saved metrics (reference best_model.pth
        # semantics, main.py:539-544), falling back to the latest save
        # (mid-epoch cursor saves carry no metrics).
        if (not os.path.isdir(os.path.join(path, "default"))
                and not os.path.exists(os.path.join(path, "_METADATA"))
                and any(d.isdigit() for d in os.listdir(path))):
            from pcss_unet_tpu.train.checkpoint import CheckpointManagerWrapper

            w = CheckpointManagerWrapper(path)
            try:
                s = w.manager.best_step()
                if s is None:
                    s = w.manager.latest_step()
            finally:
                w.close()
            if s is None:
                raise FileNotFoundError(f"no checkpoints under {path}")
            path = os.path.join(path, str(s))
        # CheckpointManager step dirs keep the payload under the default
        # item name; bare StandardCheckpointer dirs hold it directly
        if os.path.isdir(os.path.join(path, "default")):
            path = os.path.join(path, "default")
        from pcss_unet_tpu.train.checkpoint import unwrap_tree_metadata

        with ocp.StandardCheckpointer() as ckptr:
            # restore device-agnostic so checkpoints written on any mesh
            # load on any machine: rebuild the template from metadata with
            # a local single-device sharding, then pull to host
            tree = unwrap_tree_metadata(ckptr.metadata(path))
            dev = jax.config.jax_default_device or jax.devices()[0]
            sharding = jax.sharding.SingleDeviceSharding(dev)
            template = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                               sharding=sharding)
                if hasattr(m, "shape") else m, tree)
            payload = ckptr.restore(path, target=template)
        payload = jax.device_get(payload)
        if ema:
            if "ema_params" not in payload:
                raise ValueError(
                    f"--ema requested but {path} holds no ema_params "
                    "(train with ema_decay > 0 to checkpoint an EMA)")
            return {"params": payload["ema_params"],
                    "batch_stats": payload.get("batch_stats", {})}
        return {"params": payload["params"],
                "batch_stats": payload.get("batch_stats", {})}
    if ema:
        raise ValueError("--ema requires an Orbax checkpoint directory "
                         "(reference .pth/.npz exports carry no EMA)")
    from pcss_unet_tpu.train.checkpoint import load_reference_checkpoint

    return load_reference_checkpoint(path)


def pad_to_multiple(x: np.ndarray, multiple: int) -> tuple[np.ndarray, tuple]:
    """Reflection-pad NHWC to the next multiple (inference.py:154-163);
    returns (padded, (h, w)) for cropping back."""
    n, h, w, c = x.shape
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        # reflect needs pad <= dim-1; frames smaller than the alignment
        # (e.g. tiny probes routed here by the sharded paths' small-frame
        # fallback) pad with edge replication instead of crashing
        mode = "reflect" if (ph < h and pw < w) else "edge"
        x = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
    return x, (h, w)


class InferenceEngine:
    """Holds variables + a shape-cached jitted forward.

    ``engine(frames)`` with frames [B, H, W, 4] float32 → masks [B, H, W, 1]
    float32 in [0, 1]."""

    def __init__(self, model, variables: dict, *, means=None, stds=None,
                 dtype=jnp.bfloat16, pad_multiple: int = 16,
                 use_pallas: bool | None = None, fold_bn: bool = False,
                 pallas_interpret: bool = False, quantize: str = "none",
                 layout: str = "nhwc", taps: str = "stack"):
        if use_pallas is None:
            from pcss_unet_tpu.ops.pallas import pallas_available

            use_pallas = pallas_available()
        if quantize not in ("none", "int8"):
            raise ValueError(f"unknown quantize mode: {quantize}")
        if layout not in ("nhwc", "chw"):
            raise ValueError(f"unknown layout: {layout}")
        if layout == "chw":
            # channels-major end-to-end forward (infer/chw_engine.py): the
            # measured-fastest deployment posture at 2K/1080p for the
            # trimmed net (docs/BENCHMARKS.md).  Needs folded-BN params
            # (fold_bn=True here, or a model already built without BN) and
            # the Pallas kernels (or interpret mode for CPU testing).
            if not (fold_bn
                    or getattr(model, "normalization", None) == "none"):
                raise ValueError("layout='chw' requires fold_bn=True or an "
                                 "already-folded (normalization='none') "
                                 "model")
            if not (use_pallas or pallas_interpret):
                raise ValueError("layout='chw' requires the Pallas kernels "
                                 "(TPU) or pallas_interpret=True")
        self.layout = layout
        self.taps = taps
        self._dtype = dtype
        self._interpret = pallas_interpret
        clone_kw: dict = {"dtype": dtype}
        if fold_bn:
            if getattr(model, "normalization", None) != "batch_norm":
                raise ValueError("fold_bn requires a batch_norm model")
            from pcss_unet_tpu.models.fold_bn import fold_batchnorm

            variables = fold_batchnorm(variables)
            clone_kw["normalization"] = "none"
            # Folded blocks qualify for the fused Pallas ConvBlock kernel
            # (ops/pallas/convblock.py; small-channel stages, ~1.9-4.3×).
            # Kept OFF for the SPMD-sharded path: XLA cannot spatially
            # partition a custom call — ``plain_model`` serves that.
            if use_pallas or pallas_interpret:
                clone_kw["fused_inference"] = True
                clone_kw["pallas_interpret"] = pallas_interpret
            # int8 serving path (ops/int8.py): ≥128-channel blocks on the
            # int8 MXU; ~1 dB-class quality cost, measured in BENCHMARKS.
            if quantize == "int8":
                clone_kw["int8_inference"] = True
        elif quantize == "int8" and layout != "chw":
            # (layout='chw' handles int8 itself on already-folded params)
            raise ValueError("quantize='int8' requires fold_bn=True "
                             "(the int8 path runs on folded-BN blocks)")
        plain_kw = {k: v for k, v in clone_kw.items()
                    if k not in ("fused_inference", "pallas_interpret",
                                 "int8_inference")}
        try:
            self.plain_model = model.clone(**plain_kw)
        except TypeError:
            if fold_bn:
                # A silent fallback here would apply folded (batch_stats-
                # stripped) variables to the unfolded model — fail loudly.
                raise ValueError(
                    "fold_bn=True but the model does not accept "
                    f"clone(**{sorted(plain_kw)})") from None
            self.plain_model = model  # custom model without these fields
        try:
            self.model = model.clone(**clone_kw)
        except TypeError:
            if quantize == "int8":
                # the caller explicitly asked for the int8 posture; a
                # silent fall back to the fp graph would serve unquantized
                # inference while they believe the benchmarked path is on
                raise ValueError(
                    "quantize='int8' requested but the model does not "
                    f"accept clone(**{sorted(clone_kw)})") from None
            # model lacks the fused_inference deployment fields — the plain
            # graph is always a correct (just unfused) stand-in
            self.model = self.plain_model
        self.params = jax.tree.map(jnp.asarray, variables["params"])
        self.batch_stats = jax.tree.map(jnp.asarray,
                                        variables.get("batch_stats", {}))
        self.means = None if means is None else jnp.asarray(means, jnp.float32)
        self.stds = None if stds is None else jnp.asarray(stds, jnp.float32)
        self._quantize = quantize
        if layout == "chw":
            # chw_forward needs H,W divisible by 2^depth; raise the pad
            # alignment to cover deeper-than-4 variants automatically
            from pcss_unet_tpu.models.unet import widths_from_params

            widths, _, _ = widths_from_params(variables["params"])
            pad_multiple = max(pad_multiple, 2 ** len(widths))
        self.pad_multiple = pad_multiple
        self.use_pallas = use_pallas
        self._fwd = jax.jit(self._forward)
        self._fwd_plain = jax.jit(functools.partial(self._forward,
                                                    plain=True))
        self._sharded_cache: dict = {}

    def _preprocess(self, x, fused: bool):
        """Input scrub + standardization (inference.py:171-173).  ONE source
        of truth for the single-device and shard_map paths — the window-
        exactness tests pin that both agree bit-for-bit.  ``fused`` selects
        the Pallas scrub+standardize kernel; pass False for graphs the SPMD
        partitioner must split (it cannot shard a custom call)."""
        x = x.astype(jnp.float32)
        if fused and self.use_pallas and self.means is not None:
            # one fused pass: scrub + standardize (ops/pallas/fused.py)
            from pcss_unet_tpu.ops.pallas import fused_scrub_standardize

            return fused_scrub_standardize(x, self.means, self.stds,
                                           out_dtype=jnp.float32)
        x = jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=0.0)
        if self.means is not None:
            x = (x - self.means) / (self.stds + 1e-8)
        return x

    @staticmethod
    def _postprocess(out):
        """Output scrub + clip (inference.py:200-202)."""
        out = jnp.nan_to_num(out.astype(jnp.float32), nan=0.0, posinf=1.0,
                             neginf=0.0)
        return jnp.clip(out, 0.0, 1.0)

    def _forward(self, params, batch_stats, x, plain: bool = False):
        # plain=True must yield a graph with NO Pallas custom calls (the
        # SPMD partitioner cannot shard them) — so the fused scrub pre-pass
        # is gated on it too, not just the model body.
        x = self._preprocess(x, fused=not plain)
        if self.layout == "chw" and not plain:
            from pcss_unet_tpu.infer.chw_engine import chw_forward

            out = chw_forward(
                {"params": params, "batch_stats": batch_stats}, x,
                dtype=self._dtype, int8=self._quantize == "int8",
                taps=self.taps, interpret=self._interpret)
            return self._postprocess(out)
        model = self.plain_model if plain else self.model
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x, False)
        return self._postprocess(out)

    def build_sharded_forward(self, mesh, halo: int, shard_batch: bool):
        """Jitted spatially-sharded forward that KEEPS the engine's Pallas/
        int8 kernel posture: shard_map over the mesh's 'spatial' axis where
        each device slices an aligned (shard + 2·halo)-row window from the
        replicated frame, runs the full kernel path on it in window mode
        (global-coefficient resizes — models/unet.py spatial_window), and
        emits its own rows.  With halo ≥ spatial_halo(model) the
        concatenated output equals the single-device forward exactly.

        → fn(params, batch_stats, x) with x [B, H, W, C] replicated over
        'spatial' (sharded over 'data' iff shard_batch).  H must be a
        multiple of mesh['spatial'] · spatial_align(model) and W of
        spatial_align(model) — validated at trace time (16 only covers
        depth ≤ 4; a misaligned window start would silently truncate the
        global resize coefficients).  ``halo`` is rounded up to the
        alignment."""
        from jax.sharding import PartitionSpec as P

        from pcss_unet_tpu.models.unet import spatial_align

        align = max(self.pad_multiple, spatial_align(self.model))
        halo = -(-halo // align) * align
        key = (mesh, halo, shard_batch)
        fn = self._sharded_cache.get(key)
        if fn is not None:
            return fn
        n_sp = mesh.shape["spatial"]

        def fwd(params, batch_stats, x):
            B, H, W, C = x.shape
            if H % (n_sp * align) or W % align:
                raise ValueError(
                    f"sharded forward needs H divisible by n_spatial·align "
                    f"({n_sp}·{align}) and W by {align}; got H={H}, W={W} "
                    f"(pad first — infer_sharded_halo does this)")
            shard_h = H // n_sp
            ext = min(H, shard_h + 2 * halo)
            model_w = self.model.clone(spatial_window=(H, W))

            def per_shard(p, bs, xf):            # xf [B_loc, H, W, C]
                i = jax.lax.axis_index("spatial")
                start = (i * shard_h).astype(jnp.int32)
                s = jnp.clip(start - halo, 0, H - ext)
                win = jax.lax.dynamic_slice_in_dim(xf, s, ext, axis=1)
                # fused=True: per-shard kernels are the point of this path
                win = self._preprocess(win, fused=True)
                out = model_w.apply({"params": p, "batch_stats": bs},
                                    win, False, window_offset=s)
                out = self._postprocess(out)
                return jax.lax.dynamic_slice_in_dim(out, start - s, shard_h,
                                                    axis=1)

            bspec = "data" if shard_batch else None
            return jax.shard_map(
                per_shard, mesh=mesh,
                in_specs=(P(), P(), P(bspec)),
                out_specs=P(bspec, "spatial"),
                check_vma=False)(params, batch_stats, x)

        fn = jax.jit(fwd)
        self._sharded_cache[key] = fn
        return fn

    def run_padded(self, frames, plain: bool = False) -> jax.Array:
        """Forward on already-aligned frames (device array in, device array
        out; no host sync) — the hot path for benchmarking/serving.
        ``plain=True`` uses the partitioner-friendly graph (no Pallas custom
        calls) — required for the SPMD spatially-sharded path."""
        if plain:
            return self._fwd_plain(self.params, self.batch_stats, frames)
        return self._fwd(self.params, self.batch_stats, frames)

    def render_u8(self, frames) -> jax.Array:
        """Serving path: forward + on-device ×255 uint8 quantization
        (infer.py:79-80 semantics) — ~4× less device→host mask traffic.
        Uses the Pallas quantize kernel on TPU, XLA elsewhere."""
        out = self.run_padded(frames)
        if self.use_pallas:
            from pcss_unet_tpu.ops.pallas import fused_mask_to_u8

            return fused_mask_to_u8(out)
        return jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        frames = np.asarray(frames, np.float32)
        squeeze = frames.ndim == 3
        if squeeze:
            frames = frames[None]
        padded, (h, w) = pad_to_multiple(frames, self.pad_multiple)
        out = self.run_padded(jnp.asarray(padded))
        out = np.asarray(out)[:, :h, :w, :]
        return out[0] if squeeze else out
