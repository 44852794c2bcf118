"""Determinism setup.

Reference: seed 42 into python/numpy/torch + cudnn.deterministic
(main.py:73-92).  JAX is deterministic by construction given a PRNGKey; this
seeds the host-side RNGs the data pipeline uses and returns the root device
key."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int = 42) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
