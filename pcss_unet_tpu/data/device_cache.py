"""Device-resident dataset cache.

No reference equivalent: the reference re-streams every batch from host mmap
through ``DataLoader`` (setdata.py:243-245, main.py:847-865).  Shadow-mapping
packs are small (hundreds of frames), so the whole dataset fits HBM — upload
once, then gather + crop batches *on device*.  The hot loop does zero
host→device transfers and the gather stays inside XLA's async dispatch
stream.

Correctness contract (pinned by tests/test_device_cache.py): the cache is a
pure data-path optimization.  It consumes the same ``Loader.epoch_indices``
and ``Loader.crop_offsets`` as the host path, so batch streams are
bit-identical and a training run produces the same trajectory either way.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np


def dataset_nbytes(ds) -> int:
    """Total bytes a device cache of ``ds`` would occupy (float32)."""
    if hasattr(ds, "inputs"):
        return int(ds.inputs.nbytes + ds.labels.nbytes)
    h, w = ds.sample_hw
    return len(ds) * h * w * 5 * 4  # 4 input channels + 1 label channel


def cache_eligible(cfg, ds) -> bool:
    """Policy: ``device_data_cache`` = on (always) | off (never) | auto
    (cache when the dataset fits ``device_cache_budget_mb``)."""
    mode = getattr(cfg, "device_data_cache", "off")
    if mode == "off":
        return False
    if mode == "on":
        return True
    if mode != "auto":
        raise ValueError(f"device_data_cache must be on|off|auto, got {mode!r}")
    budget = cfg.device_cache_budget_mb * (1 << 20)
    return dataset_nbytes(ds) <= budget


@functools.partial(jax.jit, static_argnames=("crop_hw",), donate_argnums=())
def _gather_batch(x, y, idx, origin, crop_hw):
    xb = jnp.take(x, idx, axis=0)
    yb = jnp.take(y, idx, axis=0)
    if crop_hw is not None:
        ch, cw = crop_hw
        xb = jax.lax.dynamic_slice_in_dim(xb, origin[0], ch, axis=1)
        xb = jax.lax.dynamic_slice_in_dim(xb, origin[1], cw, axis=2)
        yb = jax.lax.dynamic_slice_in_dim(yb, origin[0], ch, axis=1)
        yb = jax.lax.dynamic_slice_in_dim(yb, origin[1], cw, axis=2)
    return xb, yb


class DeviceCache:
    """HBM-resident copy of a dataset with on-device batch gather.

    ``replicate``: sharding for the cached arrays (replicated over the mesh
    so every device can gather locally).  ``shard``: output batch sharding
    (data×spatial); None keeps the gather's natural placement.
    ``upload_chunk``: samples per H2D transfer during the one-time upload —
    bounds host RAM for NCHW packs that need a transpose on the way up.
    """

    def __init__(self, ds, replicate=None, shard=None, *,
                 crop_hw: tuple[int, int] | None = None,
                 upload_chunk: int = 64):
        self.crop_hw = tuple(crop_hw) if crop_hw else None
        self.shard = shard
        n = len(ds)
        xs, ys = [], []
        for i in range(0, n, max(1, upload_chunk)):
            idx = np.arange(i, min(i + upload_chunk, n))
            x, y = ds.gather(idx)  # NHWC float32, any pack layout
            if replicate is not None:
                xs.append(jax.device_put(x, replicate))
                ys.append(jax.device_put(y, replicate))
            else:
                xs.append(jax.device_put(x))
                ys.append(jax.device_put(y))
        self.x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)
        self.y = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=0)
        logging.info("device cache: %d samples, %.1f MiB on device",
                     n, dataset_nbytes(ds) / (1 << 20))

    def batches(self, loader, epoch: int, start_batch: int = 0):
        """Yield device (inputs, labels) batches for ``epoch``, identical in
        content and order to ``loader.epoch(epoch, start_batch)``."""
        if self.crop_hw != loader.crop_hw:
            raise ValueError(f"cache crop {self.crop_hw} != loader crop "
                             f"{loader.crop_hw}")
        batches = loader.epoch_indices(epoch)
        offsets = loader.crop_offsets(epoch, len(batches))
        zero = np.zeros(2, np.int32)
        for b, idx in enumerate(batches):
            if b < start_batch:
                continue
            origin = zero if offsets is None else offsets[b].astype(np.int32)
            xb, yb = _gather_batch(self.x, self.y, jnp.asarray(idx),
                                   jnp.asarray(origin), self.crop_hw)
            if self.shard is not None:
                xb = jax.device_put(xb, self.shard)
                yb = jax.device_put(yb, self.shard)
            yield xb, yb
