#!/usr/bin/env python
"""Epoch throughput through ``fit()`` vs the bare jitted step.

Round-1 verdict flagged per-batch host syncs in the training loop
(``int(state.step)`` + ``jax.device_get(metrics)`` every batch) that made
real epoch throughput silently lower than the bare-step number published in
docs/BENCHMARKS.md.  This measures the loop end-to-end at the BASELINE
config-1 shape (256x256, batch 8) on synthetic packs and prints steps/sec
through ``fit()`` for direct comparison with scripts/bench_train.py."""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_packs(root: str, n: int, h: int, w: int) -> None:
    rng = np.random.default_rng(0)
    np.save(os.path.join(root, "train_inputs.npy"),
            rng.standard_normal((n, h, w, 4)).astype(np.float32))
    np.save(os.path.join(root, "train_labels.npy"),
            rng.random((n, h, w, 1)).astype(np.float32))
    with open(os.path.join(root, "train_meta.json"), "w") as f:
        json.dump({"layout": "nhwc"}, f)
    np.save(os.path.join(root, "train_stats.npy"),
            {"means": [0.0] * 4, "stds": [1.0] * 4}, allow_pickle=True)


def main() -> None:
    import jax.numpy as jnp

    from pcss_unet_tpu.config import Config
    from pcss_unet_tpu.data.pipeline import Loader, PackedDataset
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.train.loop import fit

    n, h, w, batch = 64, 256, 256, 8
    epochs = 4
    with tempfile.TemporaryDirectory() as root:
        make_packs(root, n, h, w)
        ds = PackedDataset(root, "train")
        loader = Loader(ds, batch_size=batch, shuffle=True, seed=0)
        cfg = Config(batch_size=batch, num_epochs=epochs, warmup_epochs=1,
                     loss_type="standard", save_dir="", log_dir="")

        class NullWriter:
            def scalar(self, *a, **k): pass
            def image(self, *a, **k): pass
            def flush(self): pass

        model = UNet(dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        result = fit(cfg, model, loader, None, writer=NullWriter(),
                     checkpoint_dir=None, install_preemption_handler=False)
        total = time.perf_counter() - t0
        # epoch 0 pays the one-time compile; steady state = later epochs
        steady = [e["seconds"] for e in result.history[1:]]
        steps_per_epoch = loader.batches_per_epoch()
        sps = steps_per_epoch / (sum(steady) / len(steady))
        print(json.dumps({
            "metric": "fit_train_steps_per_sec",
            "value": round(sps, 3),
            "unit": "steps/sec",
            "config": f"{h}x{w} b{batch} standard loss",
            "epochs_timed": len(steady),
            "total_wall_s": round(total, 1),
        }))


if __name__ == "__main__":
    main()
