"""Mid-epoch resume: a preemption checkpoint carries a data-order cursor
(epoch + batches consumed), so resuming neither replays nor skips batches —
the combined run consumes exactly the epoch's sampling plan once.

The reference can't resume at all (SURVEY.md §5 'No resume path exists');
round-1 resume was epoch-granular (VERDICT r1 next-step #9).
"""

import os

import numpy as np
import jax.numpy as jnp

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.data import Loader, PackedDataset
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.train import fit


class RecordingDataset(PackedDataset):
    """Records every gather so the consumed batch stream is observable."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.gathered = []

    def gather(self, idx):
        self.gathered.append(np.asarray(idx).copy())
        return super().gather(idx)


def _make_packs(root):
    rng = np.random.default_rng(0)
    np.save(os.path.join(root, "train_inputs.npy"),
            rng.standard_normal((16, 16, 16, 4)).astype(np.float32))
    np.save(os.path.join(root, "train_labels.npy"),
            rng.random((16, 16, 16, 1)).astype(np.float32))


def test_loader_start_batch_is_plan_tail(tmp_path):
    _make_packs(str(tmp_path))
    ds = PackedDataset(str(tmp_path), "train")
    loader = Loader(ds, batch_size=4, shuffle=True, seed=3, crop_hw=(8, 8))
    full = list(loader.epoch(5))
    tail = list(loader.epoch(5, start_batch=2))
    assert len(tail) == len(full) - 2
    for (fx, fy), (tx, ty) in zip(full[2:], tail):
        np.testing.assert_array_equal(fx, tx)
        np.testing.assert_array_equal(fy, ty)


def test_no_replayed_or_skipped_batches(tmp_path, cpus):
    out = str(tmp_path / "d")
    os.makedirs(out)
    _make_packs(out)
    cfg = Config(batch_size=4, num_epochs=2, warmup_epochs=1,
                 data_parallel=1, spatial_parallel=1, save_frequency=1000,
                 device_data_cache="off", log_dir="", save_dir="")
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32)

    class NullWriter:
        def scalar(self, *a, **k): pass
        def image(self, *a, **k): pass
        def flush(self): pass

    # Run 1: stop after 2 of the 4 batches of epoch 0 (deterministic
    # preemption through the step_hook → same path as SIGTERM).
    ds1 = RecordingDataset(out, "train")
    loader1 = Loader(ds1, cfg.batch_size, shuffle=True, seed=7)
    r1 = fit(cfg, model, loader1, None, devices=cpus[:1],
             checkpoint_dir=str(tmp_path / "ck"), log_every=1000,
             writer=NullWriter(), install_preemption_handler=False,
             step_hook=lambda step, epoch, batch: batch >= 1)
    assert len(r1.history) == 1          # partial epoch 0 recorded

    # Run 2: resumes mid-epoch 0, finishes it, then runs epoch 1.
    ds2 = RecordingDataset(out, "train")
    loader2 = Loader(ds2, cfg.batch_size, shuffle=True, seed=7)
    r2 = fit(cfg, model, loader2, None, devices=cpus[:1],
             checkpoint_dir=str(tmp_path / "ck"), log_every=1000,
             writer=NullWriter(), install_preemption_handler=False)
    assert [h["epoch"] for h in r2.history] == [0, 1]

    # The consumed streams partition epoch 0's sampling plan exactly:
    # run 1 trained on plan[:2]; run 2's epoch-0 tail is plan[2:].  (The
    # prefetcher may have *decoded* one batch further in run 1; only the
    # trained-on prefix matters.)
    plan0 = loader1.epoch_indices(0)
    np.testing.assert_array_equal(np.concatenate(ds1.gathered[:2]),
                                  plan0[:2].ravel())
    np.testing.assert_array_equal(np.concatenate(ds2.gathered[:2]),
                                  plan0[2:].ravel())
    # and epoch 1 then runs its own full plan
    plan1 = loader2.epoch_indices(1)
    np.testing.assert_array_equal(np.concatenate(ds2.gathered[2:6]),
                                  plan1.ravel())


def test_resume_compat_guard(tmp_path):
    """Auto-resuming into a save_dir whose checkpoints came from a
    structurally different run fails fast with the actual config diff, not
    a raw Orbax tree-mismatch dump (found live: a stale save_dir from a
    group_norm run made `cli.train` crash with pages of array reprs)."""
    import json

    import pytest

    from pcss_unet_tpu.train.checkpoint import check_resume_compat

    ckdir = tmp_path / "ck"
    ckdir.mkdir()
    prev = Config(base_width=16, normalization="group_norm")
    with open(ckdir / "resolved_config.json", "w") as f:
        json.dump(prev.to_dict(), f)

    cur = Config(base_width=64, normalization="batch_norm")

    # no checkpoint step dirs yet -> nothing to resume from -> no-op
    check_resume_compat(cur, str(ckdir))

    (ckdir / "0").mkdir()  # Orbax integer step directory
    with pytest.raises(ValueError, match="base_width.*16.*64"):
        check_resume_compat(cur, str(ckdir))

    # matching structure (other keys may differ freely) -> passes
    check_resume_compat(prev.replace(learning_rate=1e-3, batch_size=2),
                        str(ckdir))

    # non-structural key changes never block resume
    check_resume_compat(cur.replace(base_width=16,
                                    normalization="group_norm"), str(ckdir))
