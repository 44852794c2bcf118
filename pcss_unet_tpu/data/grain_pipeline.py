"""Grain-backed input pipeline with the same interface as ``Loader``.

Grain supplies the sampling graph (seeded shuffle → shard slice → batch) and
optional threaded read-ahead; the datasets stay ours.  Interface-compatible
with ``pipeline.Loader`` — including ``epoch_indices`` so the device cache
(device_cache.py) can replay the identical stream — which is what lets
``fit()`` take either loader (tests/test_grain_pipeline.py).

The reference's loading is a ``DataLoader`` with workers hard-disabled
(main.py:923-924 "完全禁用多进程加载"); ``read_workers>0`` here gives the
threaded decode path it turned off.
"""

from __future__ import annotations

import numpy as np


class GrainLoader:
    def __init__(self, ds, batch_size: int, shuffle: bool = False,
                 seed: int = 0, shard_index: int = 0, shard_count: int = 1,
                 read_workers: int = 0):
        if not (0 <= shard_index < shard_count):
            raise ValueError(f"shard_index {shard_index} out of range "
                             f"[0, {shard_count})")
        self.ds = ds
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = int(seed)
        self.shard_index = int(shard_index)
        self.shard_count = int(shard_count)
        self.read_workers = int(read_workers)
        self.crop_hw = None   # crops are a Loader feature; Grain path is
                              # full-frame (use Loader for BASELINE config 1)

    def _index_ds(self, epoch: int):
        import grain

        mds = grain.MapDataset.range(len(self.ds))
        if self.shuffle:
            mds = mds.shuffle(seed=(self.seed + 1) * 1_000_003 + epoch)
        mds = mds[self.shard_index::self.shard_count]
        return mds.batch(self.batch_size, drop_remainder=True)

    def batches_per_epoch(self) -> int:
        mine = (len(self.ds) + self.shard_count - 1 - self.shard_index
                ) // self.shard_count
        return mine // self.batch_size

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """Materialized [num_batches, batch_size] index plan — the contract
        shared with Loader that the device cache consumes."""
        return np.stack([np.asarray(b) for b in self._index_ds(epoch)])

    def crop_offsets(self, epoch: int, num_batches: int):
        return None

    def epoch(self, epoch: int, start_batch: int = 0):
        import itertools

        import grain

        idx_ds = self._index_ds(epoch)
        if start_batch:
            idx_ds = grain.MapDataset.source(
                list(itertools.islice(iter(idx_ds), start_batch, None)))
        gather = self.ds.gather
        if self.read_workers > 0:
            it = idx_ds.map(
                lambda idx: gather(np.asarray(idx))
            ).to_iter_dataset(grain.ReadOptions(
                num_threads=self.read_workers,
                prefetch_buffer_size=max(2, 2 * self.read_workers)))
            yield from it
        else:
            for idx in idx_ds:
                yield gather(np.asarray(idx))

    def __iter__(self):
        return self.epoch(0)
