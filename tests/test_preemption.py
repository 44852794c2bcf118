"""Preemption handling: SIGTERM mid-training → graceful checkpoint + stop,
then resume (SURVEY.md §5 'Failure detection / elastic recovery' — the
reference has only an OOM retry and a KeyboardInterrupt print)."""

import os
import signal
import threading

import numpy as np
import jax.numpy as jnp

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.data import Loader, PackedDataset
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.train import fit


def test_sigterm_checkpoints_and_stops(tmp_path, cpus):
    out = str(tmp_path / "d")
    os.makedirs(out)
    rng = np.random.default_rng(0)
    n = 8
    np.save(os.path.join(out, "train_inputs.npy"),
            rng.standard_normal((n, 16, 16, 4)).astype(np.float32))
    np.save(os.path.join(out, "train_labels.npy"),
            rng.random((n, 16, 16, 1)).astype(np.float32))

    cfg = Config(batch_size=4, num_epochs=50, warmup_epochs=1,
                 data_parallel=1, spatial_parallel=1, save_frequency=1000,
                 log_dir=str(tmp_path / "logs"))
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32)
    loader = Loader(PackedDataset(out, "train"), cfg.batch_size)

    # fire SIGTERM shortly after training starts
    timer = threading.Timer(8.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        result = fit(cfg, model, loader, None, devices=cpus[:1],
                     checkpoint_dir=str(tmp_path / "ckpt"), log_every=1000)
    finally:
        timer.cancel()
    # stopped early (well before 50 epochs) and saved a checkpoint
    assert len(result.history) < 50
    saved = [d for d in os.listdir(tmp_path / "ckpt") if d.isdigit()]
    assert saved, "no checkpoint written on preemption"

    # resume continues from the interrupted epoch — if the preemption hit
    # mid-epoch, the interrupted epoch's tail runs first (mid-epoch cursor),
    # then the one extra epoch cfg2 allows
    cfg2 = cfg.replace(num_epochs=len(result.history) + 1)
    result2 = fit(cfg2, model, loader, None, devices=cpus[:1],
                  checkpoint_dir=str(tmp_path / "ckpt"), log_every=1000,
                  install_preemption_handler=False)
    assert len(result2.history) <= 2
