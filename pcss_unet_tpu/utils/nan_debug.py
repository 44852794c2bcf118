"""Numerical-sanitizer utilities — the TPU equivalents of the reference's
always-on anomaly machinery (SURVEY.md §5 "Race detection / sanitizers"):

- ``detect_anomalies()``: context manager flipping ``jax_debug_nans`` — the
  analogue of ``torch.autograd.set_detect_anomaly(True)`` (main.py:148),
  opt-in instead of permanently on (it forces re-execution on NaN, so it is
  a debug mode, not a production default).
- ``checked_sigmoid_range``: checkify-based invariant that model outputs are
  in [0, 1] — the reference asserts this inside its loss (customLoss.py:131,
  pert_loss.py:131), which cannot work under jit; checkify gives the same
  guard debuggably.
- ``find_nonfinite``: report which pytree leaves contain NaN/Inf (the role
  of the reference's per-parameter gradient scan, main.py:294-320).
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import checkify


@contextlib.contextmanager
def detect_anomalies():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked_sigmoid_range(fn):
    """Wrap ``fn`` so its output is checkify-asserted into [0, 1]
    (customLoss.py:131 semantics).  Returns a function whose first result is
    the checkify Error: call ``err.throw()`` to surface violations."""
    def inner(*args, **kwargs):
        out = fn(*args, **kwargs)
        checkify.check(jnp.all(out >= 0.0) & jnp.all(out <= 1.0),
                       "model output escaped [0,1] — sigmoid missing?")
        return out

    return checkify.checkify(inner)


def find_nonfinite(tree: Any) -> dict[str, dict]:
    """→ {path: {'nan': count, 'inf': count}} for offending leaves only."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    report = {}
    for path, leaf in flat:
        leaf = jnp.asarray(leaf)
        n_nan = int(jnp.isnan(leaf).sum())
        n_inf = int(jnp.isinf(leaf).sum())
        if n_nan or n_inf:
            report[jax.tree_util.keystr(path)] = {"nan": n_nan, "inf": n_inf}
    return report
