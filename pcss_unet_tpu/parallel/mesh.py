"""Device mesh construction and sharding rules.

The reference is strictly single-process single-GPU (SURVEY.md §2.12: no DP/
TP/PP/SP/EP, no collectives anywhere).  This module is the framework's
scaling layer, scaling-book style: pick a mesh, annotate shardings, let XLA
insert the collectives.

Axes:
- ``data``    — batch-dimension data parallelism.  Gradient all-reduce and
  sync-BN batch statistics ride ICI psums inserted by XLA.
- ``spatial`` — height-dimension spatial partitioning of full frames (the
  convolutional analogue of sequence/context parallelism, SURVEY.md §2.12):
  XLA's SPMD partitioner inserts halo exchanges for the 3×3 convs.  Used by
  training on huge frames and by sharded full-frame inference
  (infer/tiled.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _default_devices():
    """Devices of the backend the session is pinned to: honors an active
    ``jax.default_device`` (e.g. the test harness pins CPU while a TPU
    plugin owns the default backend)."""
    pinned = jax.config.jax_default_device
    if pinned is not None:
        return jax.devices(pinned.platform)
    return jax.devices()


def make_mesh(data_parallel: int = -1, spatial_parallel: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else _default_devices())
    n = len(devices)
    if data_parallel == -1:
        if n % spatial_parallel:
            raise ValueError(
                f"{n} devices not divisible by spatial_parallel={spatial_parallel}")
        data_parallel = n // spatial_parallel
    use = data_parallel * spatial_parallel
    if use > n:
        raise ValueError(f"mesh {data_parallel}x{spatial_parallel} needs "
                         f"{use} devices, have {n}")
    grid = np.array(devices[:use]).reshape(data_parallel, spatial_parallel)
    return Mesh(grid, ("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batches: batch over 'data', height over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_inputs(mesh: Mesh, x, y):
    """Place a host batch onto the mesh with (data, spatial) sharding."""
    s = batch_sharding(mesh)
    return jax.device_put(x, s), jax.device_put(y, s)
