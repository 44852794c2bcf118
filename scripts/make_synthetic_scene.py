#!/usr/bin/env python
"""Generate a synthetic shadow-mapping scene so the full quickstart runs
without real renders.

Emits the raw-scene layout the organize CLI consumes
(``conditioning_images/*.exr`` + ``images/*.png``): each frame is a toy
G-buffer of a plane with floating occluder discs lit by a moving point
light —

    R: camera-space depth        G: surface normal·light
    B: hard shadow-map test      A: distance-to-occluder proxy

and the PNG ground truth is a soft shadow (hard mask blurred with a
penumbra that widens with occluder distance, PCSS-style).

    python scripts/make_synthetic_scene.py --out ./scene --frames 64
    python -m pcss_unet_tpu organize --scene_dir ./scene --out_dir ./data
    ...
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def box_blur(img: np.ndarray, k: int) -> np.ndarray:
    if k <= 1:
        return img
    c = np.cumsum(np.cumsum(np.pad(img, ((k, 0), (k, 0)), mode="edge"),
                            axis=0), axis=1)
    out = (c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]) / (k * k)
    return out


def render_frame(rng: np.random.Generator, h: int, w: int):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy /= h
    xx /= w
    # ground plane depth ramp + gentle waves
    depth = 0.4 + 0.5 * yy + 0.05 * np.sin(xx * 9 + rng.uniform(0, 6.28))
    normal_dot = np.clip(0.6 + 0.4 * np.cos(yy * 3 + rng.uniform(0, 3)), 0, 1)

    hard = np.ones((h, w), np.float32)
    occ_dist = np.zeros((h, w), np.float32)
    soft = np.ones((h, w), np.float32)
    for _ in range(rng.integers(2, 5)):
        cy, cx = rng.uniform(0.15, 0.85, 2)
        r = rng.uniform(0.06, 0.18)
        height = rng.uniform(0.1, 0.5)  # occluder height above ground
        d2 = (yy - cy) ** 2 + ((xx - cx) * w / h) ** 2
        disc = d2 < r * r
        hard[disc] = 0.0
        occ_dist = np.maximum(occ_dist, disc * height)
        # soft shadow: blur radius grows with occluder height (PCSS)
        k = max(1, int(height * 40))
        soft = np.minimum(soft, box_blur((~disc).astype(np.float32), k))
    return (np.stack([depth, normal_dot, hard, occ_dist], -1),
            np.clip(soft, 0, 1))


def render_sequence(rng: np.random.Generator, h: int, w: int, frames: int):
    """Temporally coherent animation: the same occluder discs move along
    straight paths over a static background, with exact per-pixel motion
    vectors for the shadowed content.

    Returns (list of (gbuf, soft), mv [T-1, H, W, 2] float32 (dy, dx) in
    pixels — the displacement from t-1 to t of the content at each pixel
    of frame t, i.e. exactly what ``losses/temporal.py:_warp`` consumes).
    """
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy_n = yy / h
    xx_n = xx / w
    phase1, phase2 = rng.uniform(0, 6.28), rng.uniform(0, 3)
    depth = 0.4 + 0.5 * yy_n + 0.05 * np.sin(xx_n * 9 + phase1)
    normal_dot = np.clip(0.6 + 0.4 * np.cos(yy_n * 3 + phase2), 0, 1)

    n_discs = int(rng.integers(2, 5))
    c0 = rng.uniform(0.2, 0.8, (n_discs, 2))            # (cy, cx) normalized
    vel = rng.uniform(-2.0, 2.0, (n_discs, 2))          # pixels / frame
    radius = rng.uniform(0.06, 0.15, n_discs)
    height_ = rng.uniform(0.1, 0.5, n_discs)

    seq = []
    mv = np.zeros((max(frames - 1, 0), h, w, 2), np.float32)
    for t in range(frames):
        hard = np.ones((h, w), np.float32)
        occ = np.zeros((h, w), np.float32)
        soft = np.ones((h, w), np.float32)
        for i in range(n_discs):
            cy = c0[i, 0] + vel[i, 0] * t / h
            cx = c0[i, 1] + vel[i, 1] * t / w
            d2 = (yy_n - cy) ** 2 + ((xx_n - cx) * w / h) ** 2
            disc = d2 < radius[i] ** 2
            hard[disc] = 0.0
            occ = np.maximum(occ, disc * height_[i])
            k = max(1, int(height_[i] * 40))
            shadow = box_blur((~disc).astype(np.float32), k)
            soft = np.minimum(soft, shadow)
            if t > 0:
                # content in this disc's penumbra moved with the disc
                mv[t - 1][shadow < 0.999] = vel[i]
        seq.append((np.stack([depth, normal_dot, hard, occ], -1),
                    np.clip(soft, 0, 1)))
    return seq, mv


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="./scene")
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--animate", action="store_true",
                   help="also write an animated sequence with ground-truth "
                        "motion vectors: <out>/sequence/*.exr, "
                        "<out>/sequence_gt/*.png, <out>/motion.npy "
                        "([T-1,H,W,2] (dy,dx) px — cli.temporal input)")
    args = p.parse_args()

    from PIL import Image

    from pcss_unet_tpu.io.exr import write_exr

    exr_dir = os.path.join(args.out, "conditioning_images")
    png_dir = os.path.join(args.out, "images")
    os.makedirs(exr_dir, exist_ok=True)
    os.makedirs(png_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.frames):
        gbuf, soft = render_frame(rng, args.height, args.width)
        write_exr(os.path.join(exr_dir, f"frame{i:04d}.exr"),
                  {"R": gbuf[..., 0], "G": gbuf[..., 1],
                   "B": gbuf[..., 2], "A": gbuf[..., 3]})
        Image.fromarray((soft * 255).astype(np.uint8), "L").save(
            os.path.join(png_dir, f"frame{i:04d}.png"))
    print(f"wrote {args.frames} frames to {args.out}")

    if args.animate:
        seq_dir = os.path.join(args.out, "sequence")
        gt_dir = os.path.join(args.out, "sequence_gt")
        os.makedirs(seq_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        seq, mv = render_sequence(rng, args.height, args.width, args.frames)
        for i, (gbuf, soft) in enumerate(seq):
            write_exr(os.path.join(seq_dir, f"frame{i:04d}.exr"),
                      {"R": gbuf[..., 0], "G": gbuf[..., 1],
                       "B": gbuf[..., 2], "A": gbuf[..., 3]})
            Image.fromarray((soft * 255).astype(np.uint8), "L").save(
                os.path.join(gt_dir, f"frame{i:04d}.png"))
        np.save(os.path.join(args.out, "motion.npy"), mv)
        print(f"wrote animated sequence ({args.frames} frames + motion "
              f"vectors) to {seq_dir}")


if __name__ == "__main__":
    main()
