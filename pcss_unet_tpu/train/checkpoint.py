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

import json
import logging
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from pcss_unet_tpu.train.state import TrainState

# Config keys that shape the checkpointed tree structure: params
# (depth/width/channels/normalization decide the layer tree) and opt_state
# (optimizer_type decides the optax state).  A resume across a change in
# any of these cannot restore — Orbax fails with a raw tree-mismatch dump,
# so we detect it up front and say what actually changed.
RESUME_STRUCTURE_KEYS = ("model_depth", "base_width", "input_channels",
                         "output_channels", "normalization",
                         "optimizer_type")


def unwrap_tree_metadata(meta):
    """Orbax metadata object → the plain tree of leaf metadata.  Handles
    the API drift between versions: ``.item_metadata`` wrappers and
    Composite-style ``.tree`` holders."""
    tree = getattr(meta, "item_metadata", meta)
    if hasattr(tree, "tree"):
        tree = tree.tree
    return tree


def has_checkpoints(directory: str) -> bool:
    """True if ``directory`` holds at least one Orbax step directory."""
    try:
        return any(e.isdigit() and os.path.isdir(os.path.join(directory, e))
                   for e in os.listdir(directory))
    except OSError:
        return False


def check_resume_compat(cfg, directory: str) -> None:
    """Fail fast when resuming into a ``save_dir`` whose checkpoints were
    written by a structurally different run (different model variant or
    optimizer).  Reads the ``resolved_config.json`` the training CLI leaves
    next to the checkpoints — call this BEFORE overwriting that file with
    the current run's config.  No-op when there is nothing to resume from
    or no recorded config to compare against."""
    path = os.path.join(directory, "resolved_config.json")
    if not os.path.exists(path) or not has_checkpoints(directory):
        return
    try:
        with open(path) as f:
            prev = json.load(f)
    except (OSError, json.JSONDecodeError, UnicodeDecodeError):
        return  # unreadable provenance file — let restore() decide
    diffs = [(k, prev[k], getattr(cfg, k)) for k in RESUME_STRUCTURE_KEYS
             if k in prev and prev[k] != getattr(cfg, k)]
    if diffs:
        detail = "; ".join(f"{k}: checkpoint={a!r}, current={b!r}"
                           for k, a, b in diffs)
        raise ValueError(
            f"resume mismatch: the checkpoints under {directory} were "
            f"written by a run with a different model/optimizer structure "
            f"({detail}). Pass --no_resume (resume=false) to train from "
            f"scratch in place, or point save_dir at a fresh directory.")


class CheckpointManagerWrapper:
    """Epoch-keyed facade over Orbax's integer-step manager.

    Internally a save for epoch E lands at step ``E * _SUBKEYS + sub`` where
    ``sub`` counts re-saves of the same epoch (a mid-epoch preemption save
    followed by the end-of-epoch save, or repeated preemptions).  Re-saving
    therefore never deletes before writing — the stale save is removed only
    after the replacement is fully committed, so a SIGKILL at any instant
    leaves at least one complete checkpoint for the epoch on disk.

    Mid-epoch (cursor) saves are written *without* metrics so they do not
    compete in best-checkpoint retention: a partial-epoch loss average is
    not comparable to full-epoch averages (Orbax keeps metric-less saves —
    ``keep_checkpoints_without_metrics`` defaults to True).
    """

    _SUBKEYS = 1000  # max re-saves of one epoch

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

    def _steps_for_epoch(self, epoch: int) -> list[int]:
        return sorted(s for s in (self.manager.all_steps() or [])
                      if s // self._SUBKEYS == epoch)

    def save(self, state: TrainState, metrics: dict[str, float],
             epoch: int, cursor_batch: int | None = None) -> None:
        """``cursor_batch``: data-order cursor for mid-epoch saves — the
        number of batches of ``epoch`` already consumed, so resume can pick
        up at the next batch instead of replaying (or skipping) the epoch.
        None/-1 means the epoch completed."""
        mid_epoch = cursor_batch is not None and cursor_batch >= 0
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "skipped_steps": state.skipped_steps,
            "cursor_batch": np.asarray(cursor_batch if mid_epoch else -1,
                                       np.int64),
        }
        if state.ema_params is not None:
            payload["ema_params"] = state.ema_params
        stale = self._steps_for_epoch(epoch)
        sub = (stale[-1] % self._SUBKEYS + 1) if stale else 0
        if sub >= self._SUBKEYS:
            # pathological: the epoch's sub-key counter wrapped (re-saved
            # _SUBKEYS times).  The key must NOT spill into epoch+1's range
            # (it would corrupt epoch addressing) — reuse the LOWEST free
            # sub-key instead, keeping the never-delete-before-write
            # invariant (a crash before the new save commits still leaves
            # the previous save restorable; it merely stays 'latest' until
            # the post-commit cleanup below removes it).
            used = {s % self._SUBKEYS for s in stale}
            sub = next((i for i in range(self._SUBKEYS) if i not in used),
                       None)
            if sub is None:
                # every sub-key occupied — only reachable if the cleanup
                # deletes below failed _SUBKEYS times in a row.  Free the
                # OLDEST save (the newest stays on disk throughout).
                self.manager.delete(stale[0])
                self.manager.wait_until_finished()
                sub = stale[0] % self._SUBKEYS
                stale = stale[1:]
        # force=True: this wrapper owns the save policy.  Without it Orbax
        # SILENTLY SKIPS any step <= its latest_step — which both the wrap
        # path above (reused low sub-key) and a re-save after resuming from
        # an older epoch hit — and the stale cleanup below would then delete
        # the only real checkpoint.
        saved = self.manager.save(
            epoch * self._SUBKEYS + sub, args=ocp.args.StandardSave(payload),
            metrics=None if mid_epoch
            else {k: float(v) for k, v in metrics.items()},
            force=True)
        if saved is False:
            raise RuntimeError(
                f"Orbax skipped the save for epoch {epoch} (step key "
                f"{epoch * self._SUBKEYS + sub}); refusing to clean up "
                f"prior saves")
        if stale:
            # remove superseded saves of this epoch only once the new one
            # is durably committed (no delete→save loss window)
            self.manager.wait_until_finished()
            for s in stale:
                self.manager.delete(s)

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_epoch(self) -> int | None:
        s = self.manager.latest_step()
        return None if s is None else s // self._SUBKEYS

    def best_epoch(self) -> int | None:
        s = self.manager.best_step()
        return None if s is None else s // self._SUBKEYS

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
        steps = self._steps_for_epoch(epoch)
        if steps:
            step_id = steps[-1]
        elif epoch in (self.manager.all_steps() or []):
            step_id = epoch   # raw-epoch key from a pre-composite-key run
        else:
            raise FileNotFoundError(
                f"no checkpoint for epoch {epoch} under {self.directory}")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "skipped_steps": state.skipped_steps,
            "cursor_batch": np.asarray(-1, np.int64),
        }
        saved_keys = self._saved_keys(step_id)
        ema_template = state.ema_params is not None
        if saved_keys is None or "ema_params" in saved_keys:
            # Orbax restore templates must match the on-disk tree exactly;
            # when EMA is disabled the raw params serve as the (same-shaped)
            # template and the restored average is dropped below.
            template["ema_params"] = (state.ema_params if ema_template
                                      else state.params)
        # Detect pre-cursor checkpoint layouts explicitly from the saved
        # tree's metadata (a blanket except here would also swallow real
        # restore failures — corruption, shape mismatch — and silently
        # replay an epoch).
        if saved_keys is not None and "cursor_batch" not in saved_keys:
            template.pop("cursor_batch")
            restored = self.manager.restore(
                step_id, args=ocp.args.StandardRestore(template))
            cursor = -1
        else:
            restored = self.manager.restore(
                step_id, args=ocp.args.StandardRestore(template))
            cursor = int(restored["cursor_batch"])
        if ema_template and "ema_params" not in restored:
            # EMA newly enabled on a run whose checkpoints predate it:
            # seed the average from the restored raw params
            logging.info("checkpoint has no ema_params; seeding EMA from "
                         "the restored parameters")
            # copy, don't alias: the train loop donates the state
            restored["ema_params"] = jax.tree.map(jnp.copy,
                                                  restored["params"])
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            skipped_steps=restored["skipped_steps"],
            ema_params=(restored.get("ema_params", state.ema_params)
                        if ema_template else None),
        ), cursor

    def _saved_keys(self, step_id: int) -> set | None:
        """Top-level keys of the saved tree at step_id, or None when the
        metadata cannot be read (callers must then treat every key as
        possibly present, so real restore errors surface from restore(),
        not here).  Detects layouts that predate the mid-epoch cursor /
        EMA.  A manager that hasn't saved in this process returns
        ``item_metadata(...) = None`` (no handler registered yet), so fall
        back to reading the step directory's metadata directly."""
        try:
            tree = unwrap_tree_metadata(self.manager.item_metadata(step_id))
            if tree is not None:
                return set(tree)
        except Exception:  # noqa: BLE001 — metadata API drift only
            pass
        try:
            path = os.path.join(str(self.directory), str(step_id))
            if os.path.isdir(os.path.join(path, "default")):
                path = os.path.join(path, "default")
            with ocp.StandardCheckpointer() as ckptr:
                meta = ckptr.metadata(path)
            return set(unwrap_tree_metadata(meta))
        except Exception:  # noqa: BLE001
            return None

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
