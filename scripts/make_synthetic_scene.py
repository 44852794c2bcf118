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


def render_frame_variety(rng: np.random.Generator, h: int, w: int):
    """Harder multi-regime frame for the capacity/distillation study
    (VERDICT r2 next #6; paper Table 1's penumbra-width-vs-blocker-depth
    regime, paper.md:179-203): per-frame light size, contact-hardening
    penumbra gradients, mixed occluder shapes, varied backgrounds.  The
    A channel carries the PCSS penumbra proxy (occluder height × light
    size) the net must map to a spatially-varying blur width."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy /= h
    xx /= w
    slope = rng.uniform(0.2, 0.8)
    depth = (0.3 + slope * yy
             + rng.uniform(0.02, 0.1) * np.sin(xx * rng.uniform(4, 14)
                                               + rng.uniform(0, 6.28)))
    normal_dot = np.clip(
        0.5 + 0.5 * np.cos(yy * rng.uniform(1, 5) + rng.uniform(0, 3))
        * np.cos(xx * rng.uniform(0, 4) + rng.uniform(0, 3)), 0, 1)

    light = rng.uniform(0.4, 2.5)            # per-frame light size (Table 1)
    hard = np.ones((h, w), np.float32)
    occ = np.zeros((h, w), np.float32)
    soft = np.ones((h, w), np.float32)
    for _ in range(rng.integers(3, 8)):
        cy, cx = rng.uniform(0.1, 0.9, 2)
        height = rng.uniform(0.05, 0.7)
        if rng.random() < 0.6:               # disc
            r = rng.uniform(0.04, 0.16)
            d2 = (yy - cy) ** 2 + ((xx - cx) * w / h) ** 2
            mask = d2 < r * r
            extent = r
        else:                                # rotated bar
            th = rng.uniform(0, np.pi)
            a = rng.uniform(0.08, 0.3)
            b = rng.uniform(0.02, 0.07)
            u = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
            v = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
            mask = (np.abs(u) < a) & (np.abs(v) < b)
            extent = a
        if not mask.any():
            continue
        hard[mask] = 0.0
        scale = min(height * light, 1.2)     # PCSS penumbra proxy
        occ = np.maximum(occ, mask * scale)
        # contact hardening: blur width grows along a random direction
        # across the shadow (hard at the contact end, wide at the far end)
        ang = rng.uniform(0, 6.28)
        s = ((xx - cx) * np.cos(ang) + (yy - cy) * np.sin(ang)) / (
            2.0 * extent + 1e-6)
        s = np.clip(s * 0.5 + 0.5, 0.0, 1.0)
        k_lo = max(1, int(scale * 8))
        k_hi = max(2, min(int(scale * 48), w // 3))
        inv = (~mask).astype(np.float32)
        sh = (box_blur(inv, k_lo) * (1 - s) + box_blur(inv, k_hi) * s)
        soft = np.minimum(soft, sh)
    return (np.stack([depth, normal_dot, hard, occ], -1),
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
    p.add_argument("--variety", action="store_true",
                   help="harder multi-regime frames (light-size sweep, "
                        "contact hardening, mixed occluder shapes) — the "
                        "distillation-study task")
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
    render = render_frame_variety if args.variety else render_frame
    for i in range(args.frames):
        gbuf, soft = render(rng, args.height, args.width)
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
