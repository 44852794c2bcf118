#!/usr/bin/env python
"""Produce a checkpoint TRAINED BY THE REFERENCE'S TORCH SEMANTICS.

tests/golden/trained_w8.npz pins learned behavior of OUR training loop;
this fixture closes the remaining interop loop (ROADMAP "Quality /
parity"): a ``.pth`` produced by a faithful torch re-run of the
reference's training pipeline (main.py:132-581 semantics on the parity
ground-truth model, parity/unet_torch.py) must load through
``load_variables`` and score the same predictions in this framework.

Faithful reference pieces (all from /root/reference):
  - model: Unetmodel.py architecture via make_torch_reference
  - loss: alpha*L1 with alpha=0.9 — gradient-IDENTICAL to the
    reference's CustomLoss, whose VGG branch is gradient-dead
    (customLoss.py:69-90; SURVEY.md §7 hard-part 2)
  - optimizer: AdamW(lr=7e-4, weight_decay=1e-3) (main.py:952-957,
    config.ini)
  - LR schedule: LambdaLR linear warmup 5 epochs then cosine floored at
    1% of base, stepped per epoch (main.py:959-969)
  - grad clip: max_norm 1.0 for the first half of training, then
    max(0.1, 1 - epoch_ratio) (main.py:356-358, 405)
  - DataLoader semantics: batch 8, NO shuffle (main.py:850, 923-924)
  - checkpoint: torch.save({'epoch','model_state_dict',
    'optimizer_state_dict','loss'}) (main.py:539-544)

Deviation (documented): dropout 0.0 instead of 0.2 — at this toy scale
dropout swamps the 48-frame signal; parity is asserted at eval where
dropout is off either way.

Regenerate intentionally with:
    python scripts/make_torch_trained_golden.py
"""

import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, "tests", "golden", "torch_trained_w8.pth")
META = os.path.join(REPO, "tests", "golden", "torch_trained_w8.json")
WIDTHS = (8, 16, 32, 64)
SEED_TRAIN, SEED_VAL = 77, 78
N_TRAIN, N_VAL, HW = 48, 6, 64
EPOCHS = 200
BATCH = 8
LR, WD, WARMUP = 7e-4, 1e-3, 5


def make_frames(seed: int, n: int):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_synthetic_scene import render_frame

    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for _ in range(n):
        gbuf, soft = render_frame(rng, HW, HW)
        xs.append(gbuf)
        ys.append(soft[..., None])
    return np.stack(xs), np.stack(ys)


def main() -> None:
    import torch

    from pcss_unet_tpu.parity.unet_torch import make_torch_reference

    torch.manual_seed(42)  # reference seeds everything with 42 (main.py:73)
    xt, yt = make_frames(SEED_TRAIN, N_TRAIN)
    xv, yv = make_frames(SEED_VAL, N_VAL)
    means = xt.mean(axis=(0, 1, 2)).astype(np.float32)
    stds = (xt.std(axis=(0, 1, 2)) + 1e-8).astype(np.float32)

    # NCHW standardized tensors, like MmapLiverDataset (setdata.py:316)
    def to_nchw(x):
        return torch.from_numpy(
            ((x - means) / stds).transpose(0, 3, 1, 2).copy()).float()

    xt_t = to_nchw(xt)
    yt_t = torch.from_numpy(yt.transpose(0, 3, 1, 2).copy()).float()

    model = make_torch_reference(widths=WIDTHS, dropout=0.0)
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)

    def lr_lambda(epoch):  # main.py:959-969
        if epoch < WARMUP:
            return (epoch + 1) / WARMUP
        progress = (epoch - WARMUP) / max(1, EPOCHS - WARMUP)
        return max(0.01, 0.5 * (1.0 + math.cos(math.pi * progress)))

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda)
    alpha = 0.9  # CustomLoss blend; VGG branch is gradient-dead
    model.train()
    n_steps = N_TRAIN // BATCH
    last_loss = float("nan")
    for epoch in range(EPOCHS):
        for b in range(n_steps):  # shuffle=False (main.py:850)
            sl = slice(b * BATCH, (b + 1) * BATCH)
            opt.zero_grad()
            out = model(xt_t[sl])
            loss = alpha * torch.nn.functional.l1_loss(out, yt_t[sl])
            loss.backward()
            # dynamic clip (main.py:356-358, 405)
            ratio = epoch / EPOCHS
            max_norm = 1.0 if ratio < 0.5 else max(0.1, 1.0 - ratio)
            torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm)
            opt.step()
            last_loss = float(loss.detach())
        sched.step()
        if (epoch + 1) % 50 == 0:
            print(f"epoch {epoch + 1}/{EPOCHS} loss {last_loss:.5f}")

    # best-checkpoint dict exactly as main.py:539-544 writes it
    torch.save({"epoch": EPOCHS - 1,
                "model_state_dict": model.state_dict(),
                "optimizer_state_dict": opt.state_dict(),
                "loss": last_loss}, FIXTURE)

    # torch-side eval predictions + label PSNR on the val frames
    model.eval()
    xv_t = to_nchw(xv)
    with torch.no_grad():
        pv = model(xv_t).numpy()[:, 0]
    mse = np.mean((pv - yv[..., 0]) ** 2, axis=(1, 2))
    psnr = float(np.mean(10 * np.log10(1.0 / np.maximum(mse, 1e-12))))
    meta = {"widths": list(WIDTHS), "val_psnr_db": round(psnr, 3),
            "means": [float(m) for m in means],
            "stds": [float(s) for s in stds],
            "epochs": EPOCHS, "batch": BATCH, "lr": LR, "alpha": alpha,
            "seed_train": SEED_TRAIN, "seed_val": SEED_VAL,
            "n_train": N_TRAIN, "n_val": N_VAL, "hw": HW}
    with open(META, "w") as f:
        json.dump(meta, f, indent=1)
    print(f"torch-trained fixture: val PSNR {psnr:.2f} dB -> {FIXTURE}")


if __name__ == "__main__":
    main()
