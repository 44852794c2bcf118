"""Orbax checkpointing with best-metric retention AND resume.

The reference only ever *saves*: a dict ``{'epoch', 'model_state_dict',
'optimizer_state_dict', 'loss'}`` for the best validation loss
(main.py:539-544; best-train fallback at 548-561) — it has **no resume
path** (SURVEY.md §5) and its ``save_frequency`` config key is read by
nothing.  This manager is a superset:

- step-indexed saves every ``save_frequency`` epochs (giving the dead
  config key its documented meaning)
- best-val retention (``best_fn`` on val loss)
- true resume: params + batch_stats + opt_state + step + skip counters
- export/import to the reference's torch naming via models/torch_import.py
  so checkpoints cross frameworks in both directions
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from pcss_unet_tpu.train.state import TrainState


class CheckpointManagerWrapper:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 keep_best: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m.get("val_loss", m.get("train_loss", 1e30)))
            if keep_best else None,
            best_mode="min" if keep_best else None,
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, metrics: dict[str, float],
             epoch: int, cursor_batch: int | None = None) -> None:
        """``cursor_batch``: data-order cursor for mid-epoch saves — the
        number of batches of ``epoch`` already consumed, so resume can pick
        up at the next batch instead of replaying (or skipping) the epoch.
        None/-1 means the epoch completed."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "skipped_steps": state.skipped_steps,
            "cursor_batch": np.asarray(-1 if cursor_batch is None
                                       else cursor_batch, np.int64),
        }
        if epoch in (self.manager.all_steps() or []):
            # re-saving the epoch a preemption checkpoint half-wrote
            self.manager.delete(epoch)
        self.manager.save(
            epoch, args=ocp.args.StandardSave(payload),
            metrics={k: float(v) for k, v in metrics.items()})

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self.manager.latest_step()

    def best_epoch(self) -> int | None:
        return self.manager.best_step()

    def restore(self, state: TrainState,
                epoch: int | None = None) -> tuple[TrainState, int]:
        """Restore into the given (template) state; latest epoch by default.
        → (state, cursor_batch) — cursor_batch is -1 when the checkpointed
        epoch completed (resume at the next epoch), else the number of
        batches already consumed (resume mid-epoch).  Checkpoints written
        before the cursor existed restore with -1."""
        epoch = self.latest_epoch() if epoch is None else epoch
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "skipped_steps": state.skipped_steps,
            "cursor_batch": np.asarray(-1, np.int64),
        }
        try:
            restored = self.manager.restore(
                epoch, args=ocp.args.StandardRestore(template))
            cursor = int(restored["cursor_batch"])
        except Exception:  # noqa: BLE001 — pre-cursor checkpoint layout
            template.pop("cursor_batch")
            restored = self.manager.restore(
                epoch, args=ocp.args.StandardRestore(template))
            cursor = -1
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            skipped_steps=restored["skipped_steps"],
        ), cursor

    def close(self) -> None:
        self.manager.close()


def export_reference_checkpoint(state: TrainState, path: str) -> None:
    """Write an ``.npz`` with reference-named arrays (conv2.conv.0.weight …)
    consumable by ``load_reference_checkpoint`` and convertible to ``.pth``
    by scripts/export_torch_checkpoint.py."""
    from pcss_unet_tpu.models.torch_import import export_to_torch_state_dict

    flat = export_to_torch_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})
    np.savez(path, **flat)
    logging.info("exported reference-format checkpoint to %s", path)


def load_reference_checkpoint(path: str) -> dict[str, Any]:
    """Load a reference checkpoint: ``.pth`` (torch pickles, both the
    dict-with-model_state_dict and raw formats — infer.py:36-41) or ``.npz``
    (our export).  → Flax variables {'params','batch_stats'}."""
    from pcss_unet_tpu.models.torch_import import (
        convert_torch_state_dict, load_torch_checkpoint)

    if path.endswith(".npz"):
        data = np.load(path)
        return convert_torch_state_dict({k: data[k] for k in data.files})
    return load_torch_checkpoint(path)
