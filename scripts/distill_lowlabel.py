#!/usr/bin/env python
"""Distillation in the regime it exists for: scarce labels.

The paper's labels are expensive 4096-sample renders (paper.md:179); the
deployment pipeline distills the big net so the trimmed net can learn from
teacher outputs where ground truth is unaffordable.  The full-label study
(scripts/distill_study.py) measures the OTHER regime — dense clean labels —
where copying teacher outputs can only add noise.  This study reconstructs
the scarce-label regime on the --variety scene:

- ``scratch_small``: w16 student trained on only N_LABELED real pairs;
- ``distilled_mixed``: w16 student trained on the same N_LABELED real
  pairs PLUS teacher-predicted masks on the remaining unlabeled frames
  (data distillation — the teacher run through the real inference CLI);
- reference points: the teacher and the full-label scratch student from
  the prior study.

Usage (after scripts/distill_study.py --work WORK --variety):
    python scripts/distill_lowlabel.py --work WORK [--n_labeled 16]
"""

import argparse
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from distill_study import eval_psnr, latest_ckpt, run, write_ini  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--work", required=True,
                   help="distill_study work dir (teacher already trained)")
    p.add_argument("--n_labeled", type=int, default=16)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args()

    work = args.work
    data, proc = os.path.join(work, "data"), os.path.join(work, "proc")
    t_ckpt = latest_ckpt(os.path.join(work, "teacher"))
    py = sys.executable

    train_dir = os.path.join(data, "train")
    pairs = sorted(f[:-len("_input.exr")] for f in os.listdir(train_dir)
                   if f.endswith("_input.exr"))
    labeled = pairs[:args.n_labeled]
    unlabeled = pairs[args.n_labeled:]

    # --- small: only the labeled pairs ---
    small_dir = os.path.join(work, "train_small")
    os.makedirs(small_dir, exist_ok=True)
    for stem in labeled:
        for sfx in ("_input.exr", "_gt.png"):
            shutil.copy(os.path.join(train_dir, stem + sfx),
                        os.path.join(small_dir, stem + sfx))

    # --- mixed: labeled pairs + teacher-predicted masks on the rest ---
    mixed_dir = os.path.join(work, "train_mixed")
    os.makedirs(mixed_dir, exist_ok=True)
    for stem in labeled:
        for sfx in ("_input.exr", "_gt.png"):
            shutil.copy(os.path.join(train_dir, stem + sfx),
                        os.path.join(mixed_dir, stem + sfx))
    import jax.numpy as jnp

    from pcss_unet_tpu.config import Config
    from pcss_unet_tpu.data.stats import load_channel_stats
    from pcss_unet_tpu.infer import InferenceEngine, load_variables
    from pcss_unet_tpu.io.exr import read_exr_stack
    from pcss_unet_tpu.io.png import write_mask_png
    from pcss_unet_tpu.models import unet_from_config

    means, stds = load_channel_stats(proc)
    teacher = InferenceEngine(
        unet_from_config(Config(model_depth=4, base_width=64)),
        load_variables(t_ckpt), means=means, stds=stds,
        dtype=jnp.bfloat16, fold_bn=True)
    for stem in unlabeled:
        src = os.path.join(train_dir, stem + "_input.exr")
        mask = np.asarray(teacher(read_exr_stack(src)))
        shutil.copy(src, os.path.join(mixed_dir, stem + "_input.exr"))
        write_mask_png(os.path.join(mixed_dir, stem + "_gt.png"), mask)
    print(f"mixed set: {len(labeled)} real + {len(unlabeled)} teacher-"
          "labeled", flush=True)

    rows = []
    for tag, tdir in (("scratch_small", small_dir),
                      ("distilled_mixed", mixed_dir)):
        proc_d = os.path.join(work, f"proc_{tag}")
        run([py, "-m", "pcss_unet_tpu.cli.prepare", "--train_dir", tdir,
             "--val_dir", os.path.join(data, "val"), "--out_dir", proc_d])
        run([py, "-m", "pcss_unet_tpu.cli.stats", "--dataset_path", proc_d])
        s_dir = os.path.join(work, f"student_{tag}")
        ini = os.path.join(work, f"student_{tag}.ini")
        write_ini(ini, proc_d, s_dir, base_width=16, epochs=args.epochs,
                  batch_size=args.batch_size)
        run([py, "-m", "pcss_unet_tpu.cli.train", "--config", ini,
             "--no_resume", "--allow_random_vgg"])
        rows.append({"model": f"student_w16_{tag}",
                     "n_real_labels": len(labeled),
                     "psnr_db": round(eval_psnr(latest_ckpt(s_dir), 16,
                                                proc_d, data), 2)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"work": work, "rows": rows}))


if __name__ == "__main__":
    main()
