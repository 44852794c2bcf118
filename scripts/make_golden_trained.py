#!/usr/bin/env python
"""Produce the committed TRAINED golden fixture (VERDICT r2 weak #6).

Trains the toy-scale depth-4 net on a deterministic synthetic scene on the
CPU backend, then freezes (a) the trained weights in the *reference's*
state-dict naming (so the converter sits inside the frozen surface, like
tests/golden/unet_eval.npz) and (b) the achieved validation label-PSNR.
tests/test_golden_trained.py regenerates the same validation frames and
asserts the committed weights still reach the committed quality — pinning
*learned* behavior, not just numerics.

Regenerate intentionally with:
    python scripts/make_golden_trained.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, "tests", "golden", "trained_w8.npz")
META = os.path.join(REPO, "tests", "golden", "trained_w8.json")
WIDTHS = (8, 16, 32, 64)
SEED_TRAIN, SEED_VAL = 77, 78
N_TRAIN, N_VAL, HW = 48, 6, 64
EPOCHS = 200


def make_frames(seed: int, n: int):
    """Deterministic (G-buffer, soft-shadow) pairs from the synthetic
    renderer (np.random.default_rng streams are version-stable)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_synthetic_scene import render_frame

    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for _ in range(n):
        gbuf, soft = render_frame(rng, HW, HW)
        xs.append(gbuf)
        ys.append(soft[..., None])
    return np.stack(xs), np.stack(ys)


def eval_psnr(model, variables, means, stds, xs, ys) -> float:
    from pcss_unet_tpu.infer import InferenceEngine

    import jax.numpy as jnp

    engine = InferenceEngine(model, variables, means=means, stds=stds,
                             dtype=jnp.float32)
    psnrs = []
    for x, y in zip(xs, ys):
        pred = np.asarray(engine(x))[..., 0]
        mse = float(np.mean((pred - y[..., 0]) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    return float(np.mean(psnrs))


def main() -> None:
    import jax

    jax.config.update("jax_platform_name", "cpu")
    import jax.numpy as jnp

    from pcss_unet_tpu.config import Config
    from pcss_unet_tpu.data.pipeline import Loader
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.train.checkpoint import export_reference_checkpoint
    from pcss_unet_tpu.train.loop import fit

    xt, yt = make_frames(SEED_TRAIN, N_TRAIN)
    xv, yv = make_frames(SEED_VAL, N_VAL)
    means = xt.mean(axis=(0, 1, 2)).astype(np.float32)
    stds = (xt.std(axis=(0, 1, 2)) + 1e-8).astype(np.float32)

    class ArrayDataset:
        inputs = ((xt - means) / stds).astype(np.float32)
        labels = yt.astype(np.float32)
        sample_hw = (HW, HW)
        split = "train"

        def __len__(self):
            return N_TRAIN

        def gather(self, idx):
            return self.inputs[idx], self.labels[idx]

        means_ = means
        stds_ = stds
    ArrayDataset.means = means
    ArrayDataset.stds = stds

    class NullWriter:
        def scalar(self, *a, **k):
            pass

        def image(self, *a, **k):
            pass

        def flush(self):
            pass

    loader = Loader(ArrayDataset(), batch_size=6, shuffle=True, seed=0)
    cfg = Config(batch_size=6, num_epochs=EPOCHS, warmup_epochs=8,
                 learning_rate=1e-3, alpha=1.0, dropout_rate=0.0,
                 save_dir="", log_dir="")
    model = UNet(encoder_widths=WIDTHS, dtype=jnp.float32, dropout_rate=0.0)
    result = fit(cfg, model, loader, None, writer=NullWriter(),
                 devices=jax.devices("cpu")[:1], checkpoint_dir=None,
                 install_preemption_handler=False)

    export_reference_checkpoint(result.state, FIXTURE)
    variables = {"params": jax.device_get(result.state.params),
                 "batch_stats": jax.device_get(result.state.batch_stats)}
    psnr = eval_psnr(model, variables, means, stds, xv, yv)
    meta = {"widths": list(WIDTHS), "val_psnr_db": round(psnr, 3),
            "means": means.tolist(), "stds": stds.tolist(),
            "epochs": EPOCHS, "seed_train": SEED_TRAIN,
            "seed_val": SEED_VAL, "n_train": N_TRAIN, "n_val": N_VAL,
            "hw": HW}
    with open(META, "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
