"""Multi-host initialization glue.

Single-host multi-chip needs nothing (jax sees all local devices).  For
multi-host slices, call ``initialize_multihost()`` before any jax use (the
train CLI's ``--multihost`` flag does).  Loaders then shard the data by
process: ``host_shard_args()`` feeds Loader/GrainLoader's
``shard_index/shard_count``.

The reference has no distributed surface at all (SURVEY.md §2.12); this is
the DCN-side counterpart of the ICI-mesh story in parallel/mesh.py.
"""

from __future__ import annotations

import logging


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` with TPU auto-detection when args are
    omitted (on Cloud TPU the env provides everything)."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logging.info("multihost initialized: process %d/%d, %d local / %d "
                 "global devices", jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())


def host_shard_args() -> dict:
    """→ {'shard_index', 'shard_count'} for per-host data sharding."""
    import jax

    return {"shard_index": jax.process_index(),
            "shard_count": jax.process_count()}
