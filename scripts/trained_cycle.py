#!/usr/bin/env python
"""Trained-checkpoint closed loop at full size on real hardware
(VERDICT r1 missing #3 / next-round #5).

Drives the REAL user surfaces end-to-end:

  synthetic scene → cli.organize → cli.prepare → cli.stats
  → cli.train (reference-size net, until converged)
  → export_torch_checkpoint.py (Orbax → .pth)
  → cli.infer with the .pth (reload through the reference format)
  → cli.validate (train-vis vs infer parity, reference verdict thresholds —
    the role of /root/reference/validate_consistency.py:21-202)
  → torch-side forward parity of the SAME trained weights
    (parity/unet_torch.py replica, strict state-dict load)

Prints one JSON summary line; exits nonzero if any stage fails.
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, **kw):
    print(f"+ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--work", default=None, help="working dir (default: tmp)")
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args()

    work = args.work or tempfile.mkdtemp(prefix="trained_cycle_")
    scene, data, proc, ckpt = (os.path.join(work, d) for d in
                               ("scene", "data", "proc", "ckpt"))
    py = sys.executable

    # --- data pipeline ---
    run([py, "scripts/make_synthetic_scene.py", "--out", scene,
         "--frames", str(args.frames), "--height", str(args.size),
         "--width", str(args.size)])
    run([py, "-m", "pcss_unet_tpu.cli.organize", "--scene_dir", scene,
         "--out_dir", data])
    run([py, "-m", "pcss_unet_tpu.cli.prepare",
         "--train_dir", f"{data}/train", "--val_dir", f"{data}/val",
         "--out_dir", proc])
    run([py, "-m", "pcss_unet_tpu.cli.stats", "--dataset_path", proc])

    # --- train the reference-size net ---
    run([py, "-m", "pcss_unet_tpu.cli.train", "--config", "config.ini",
         "--processed_data_dir", proc, "--save_dir", ckpt,
         "--batch_size", str(args.batch_size),
         "--num_epochs", str(args.epochs), "--no_resume",
         "--allow_random_vgg"])

    # newest checkpoint step dir
    steps = sorted(int(d) for d in os.listdir(ckpt) if d.isdigit())
    best = os.path.join(ckpt, str(steps[-1]))

    # --- export Orbax → .pth ---
    pth = os.path.join(work, "trained.pth")
    run([py, "scripts/export_torch_checkpoint.py", "--checkpoint", best,
         "--out", pth])

    # --- infer with BOTH formats on a val frame ---
    val_exr = sorted(f for f in os.listdir(f"{data}/val")
                     if f.endswith("_input.exr"))[0]
    val_path = f"{data}/val/{val_exr}"
    png_orbax = os.path.join(work, "out_orbax.png")
    png_pth = os.path.join(work, "out_pth.png")
    run([py, "-m", "pcss_unet_tpu.cli.infer", "--input", val_path,
         "--output", png_orbax, "--weights", best, "--stats_dir", proc,
         "--dtype", "float32"])
    run([py, "-m", "pcss_unet_tpu.cli.infer", "--input", val_path,
         "--output", png_pth, "--weights", pth, "--stats_dir", proc,
         "--dtype", "float32"])
    from PIL import Image
    a = np.asarray(Image.open(png_orbax), np.float32)
    b = np.asarray(Image.open(png_pth), np.float32)
    export_max_err = float(np.abs(a - b).max())

    # --- consistency validator on the trained model ---
    run([py, "-m", "pcss_unet_tpu.cli.validate", "--weights", best,
         "--input", val_path, "--output_dir", os.path.join(work, "val_out"),
         "--stats_dir", proc])

    # --- torch-side forward parity on the trained weights ---
    import jax.numpy as jnp
    import torch

    from pcss_unet_tpu.data.stats import load_channel_stats
    from pcss_unet_tpu.infer.frame import (
        InferenceEngine, load_variables, pad_to_multiple,
    )
    from pcss_unet_tpu.io.exr import read_exr_stack
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.parity.unet_torch import make_torch_reference

    frame = read_exr_stack(val_path)
    tm = make_torch_reference()
    sd = torch.load(pth, weights_only=True)["model_state_dict"]
    tm.load_state_dict(sd, strict=True)
    tm.eval()
    means, stds = load_channel_stats(proc)
    eng = InferenceEngine(UNet(dtype=jnp.float32), load_variables(best),
                          means=means, stds=stds, dtype=jnp.float32)
    ours = np.asarray(eng(frame)).squeeze()
    # replicate the engine's input processing exactly: scrub → standardize
    # → reflect-pad to ×16 (inference.py:154-173 semantics)
    xn = np.nan_to_num(frame, nan=0.0, posinf=1.0, neginf=0.0)
    xn = (xn - means) / (stds + 1e-8)
    xp, (h, w) = pad_to_multiple(xn[None], 16)
    with torch.inference_mode():
        t = tm(torch.from_numpy(xp.transpose(0, 3, 1, 2)))
    t = t.numpy()[0, 0, :h, :w]
    mse = float(np.mean((ours - t) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))

    # training quality: resolved val loss from history is not persisted;
    # use prediction-vs-GT PSNR on the val frame as the convergence signal
    from pcss_unet_tpu.io.png import read_label_png
    gt = read_label_png(val_path.replace("_input.exr", "_gt.png"),
                        frame.shape[:2])
    q_mse = float(np.mean((ours - gt) ** 2))
    q_psnr = 10 * np.log10(1.0 / max(q_mse, 1e-12))

    print(json.dumps({
        "metric": "trained_cycle",
        "torch_parity_psnr_db": round(psnr, 2),
        "torch_parity_mse": mse,
        "pth_vs_orbax_png_max_err": export_max_err,
        "pred_vs_gt_psnr_db": round(q_psnr, 2),
        "epochs": args.epochs, "frames": args.frames, "size": args.size,
        "work": work,
        "ok": bool(psnr > 50 and export_max_err <= 1.0),
    }))
    if not (psnr > 50 and export_max_err <= 1.0):
        sys.exit(1)


if __name__ == "__main__":
    main()
