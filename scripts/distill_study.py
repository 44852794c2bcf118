#!/usr/bin/env python
"""Distillation study (the paper's 25 MB→2.5 MB deployment trimming,
paper.md:143): train the full-size teacher on the synthetic scene, then the
trimmed ``base_width=16`` student (a) from scratch and (b) distilled from
the teacher's soft masks, and report label-PSNR of all three on held-out
frames — the quality-vs-fps numbers for docs/BENCHMARKS.md.

Drives the real CLI surfaces (organize/prepare/stats/train) end to end;
prints one JSON line per row.
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


def write_ini(path: str, proc: str, save_dir: str, *, base_width: int,
              epochs: int, batch_size: int, extra: dict | None = None):
    lines = [
        "[base]",
        f"batch_size={batch_size}",
        f"num_epochs={epochs}",
        "learning_rate=0.0007",
        "warmup_epochs=4",
        "model_depth=4",
        f"base_width={base_width}",
        f"processed_data_dir={proc}",
        f"save_dir={save_dir}",
        f"log_dir={save_dir}/logs",
        "validation_frequency=2",
        "save_frequency=1000",
    ]
    for k, v in (extra or {}).items():
        lines.append(f"{k}={v}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def latest_ckpt(save_dir: str) -> str:
    steps = sorted(int(d) for d in os.listdir(save_dir) if d.isdigit())
    return os.path.join(save_dir, str(steps[-1]))


def eval_psnr(ckpt: str, base_width: int, proc: str, data: str) -> float:
    """Mean PSNR (dB) of eval-mode predictions vs PNG labels on val."""
    import jax.numpy as jnp

    from pcss_unet_tpu.config import Config
    from pcss_unet_tpu.data.stats import load_channel_stats
    from pcss_unet_tpu.infer import InferenceEngine, load_variables
    from pcss_unet_tpu.io.exr import read_exr_stack
    from pcss_unet_tpu.io.png import read_label_png
    from pcss_unet_tpu.models import unet_from_config

    cfg = Config(model_depth=4, base_width=base_width)
    model = unet_from_config(cfg)
    variables = load_variables(ckpt)
    means, stds = load_channel_stats(proc)
    engine = InferenceEngine(model, variables, means=means, stds=stds,
                             dtype=jnp.bfloat16, fold_bn=True)
    psnrs = []
    val = os.path.join(data, "val")
    for fname in sorted(os.listdir(val)):
        if not fname.endswith("_input.exr"):
            continue
        frame = read_exr_stack(os.path.join(val, fname))
        label = read_label_png(os.path.join(
            val, fname.replace("_input.exr", "_gt.png")))
        pred = np.asarray(engine(frame))[..., 0]
        mse = float(np.mean((pred - label) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    return float(np.mean(psnrs))


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--work", default=None)
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--distill_weight", type=float, default=1.0)
    p.add_argument("--variety", action="store_true",
                   help="use the harder multi-regime scene (the capacity-"
                        "gap task; see make_synthetic_scene.py --variety)")
    args = p.parse_args()

    work = args.work or tempfile.mkdtemp(prefix="distill_study_")
    scene, data, proc = (os.path.join(work, d)
                         for d in ("scene", "data", "proc"))
    py = sys.executable

    run([py, "scripts/make_synthetic_scene.py", "--out", scene,
         "--frames", str(args.frames), "--height", str(args.size),
         "--width", str(args.size)]
        + (["--variety"] if args.variety else []))
    run([py, "-m", "pcss_unet_tpu.cli.organize", "--scene_dir", scene,
         "--out_dir", data])
    run([py, "-m", "pcss_unet_tpu.cli.prepare",
         "--train_dir", f"{data}/train", "--val_dir", f"{data}/val",
         "--out_dir", proc])
    run([py, "-m", "pcss_unet_tpu.cli.stats", "--dataset_path", proc])

    rows = []

    # --- teacher: full-size reference net ---
    t_dir = os.path.join(work, "teacher")
    t_ini = os.path.join(work, "teacher.ini")
    write_ini(t_ini, proc, t_dir, base_width=64, epochs=args.epochs,
              batch_size=args.batch_size)
    run([py, "-m", "pcss_unet_tpu.cli.train", "--config", t_ini,
         "--no_resume", "--allow_random_vgg"])
    t_ckpt = latest_ckpt(t_dir)
    rows.append({"model": "teacher_w64", "psnr_db":
                 round(eval_psnr(t_ckpt, 64, proc, data), 2)})
    print(json.dumps(rows[-1]), flush=True)

    # --- student from scratch ---
    s_dir = os.path.join(work, "student_scratch")
    s_ini = os.path.join(work, "student_scratch.ini")
    write_ini(s_ini, proc, s_dir, base_width=16, epochs=args.epochs,
              batch_size=args.batch_size)
    run([py, "-m", "pcss_unet_tpu.cli.train", "--config", s_ini,
         "--no_resume", "--allow_random_vgg"])
    rows.append({"model": "student_w16_scratch", "psnr_db":
                 round(eval_psnr(latest_ckpt(s_dir), 16, proc, data), 2)})
    print(json.dumps(rows[-1]), flush=True)

    # --- student distilled from the teacher ---
    d_dir = os.path.join(work, "student_distilled")
    d_ini = os.path.join(work, "student_distill.ini")
    write_ini(d_ini, proc, d_dir, base_width=16, epochs=args.epochs,
              batch_size=args.batch_size,
              extra={"distill_teacher": t_ckpt,
                     "distill_teacher_width": 64,
                     "distill_weight": args.distill_weight})
    run([py, "-m", "pcss_unet_tpu.cli.train", "--config", d_ini,
         "--no_resume", "--allow_random_vgg"])
    rows.append({"model": "student_w16_distilled", "psnr_db":
                 round(eval_psnr(latest_ckpt(d_dir), 16, proc, data), 2)})
    print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"work": work, "rows": rows}))


if __name__ == "__main__":
    main()
