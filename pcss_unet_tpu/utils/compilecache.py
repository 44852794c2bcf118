"""Persistent XLA compilation cache.

The remote AOT compile of the reference-scale (2048x1024 batch-8) train
step costs 20+ minutes through this image's TPU tunnel; the paper-scale
inference graphs cost minutes.  JAX's persistent compilation cache
serializes the compiled executable keyed on the HLO, so any process that
compiles the same program again — a retried bench session, a resumed
training run, the driver's round-end bench — loads it in milliseconds.
Verified working against the axon PJRT plugin (second process: 0.0 s for
a compile that took 1.8 s cold).

Usage: call :func:`enable_persistent_cache` any time before the first
compile (works after ``import jax``).  Honours
``JAX_COMPILATION_CACHE_DIR`` if the caller already set it; defaults to
``~/.cache/pcss_unet_tpu/jax_cache``.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 5.0) -> str:
    """Turn on JAX's on-disk compilation cache; returns the cache dir.

    Safe to call repeatedly.  ``path`` wins over the env var, which wins
    over the default.  Executables whose compile took less than
    ``min_compile_secs`` are not persisted (keeps the cache small; the
    expensive graphs are the only ones worth keeping).
    """
    import jax

    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "pcss_unet_tpu", "jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
