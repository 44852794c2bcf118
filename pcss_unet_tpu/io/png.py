"""PNG label/mask IO with the reference's conventions.

Labels: grayscale decode (PIL ``convert('L')``), NEAREST resize to the input
resolution when sizes mismatch, scale to [0,1] by /255
(setdata.py:164-168, prepare_dataset.py:46-52).

Masks: model output in [0,1] → ×255 → uint8 grayscale PNG (infer.py:79-80);
multi-format save L/RGB/RGBA mirrors inference.py:111-128.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def read_label_png(path: str, target_hw: tuple[int, int] | None = None) -> np.ndarray:
    """→ float32 [H, W] in [0, 1]."""
    img = Image.open(path).convert("L")
    if target_hw is not None and (img.height, img.width) != tuple(target_hw):
        img = img.resize((target_hw[1], target_hw[0]), Image.NEAREST)
    return np.asarray(img, np.float32) / 255.0


def write_mask_png(path: str, mask: np.ndarray, mode: str = "L") -> None:
    """Write a [H, W] or [H, W, 1] float mask in [0,1] as PNG.

    mode: 'L' (grayscale, infer.py:79-80), 'RGB', or 'RGBA'
    (inference.py:111-128)."""
    arr = np.asarray(mask, np.float32)
    if arr.ndim == 3:
        arr = arr[..., 0]
    arr = np.clip(np.nan_to_num(arr, nan=0.0, posinf=1.0, neginf=0.0), 0.0, 1.0)
    u8 = (arr * 255.0).astype(np.uint8)
    if mode == "L":
        img = Image.fromarray(u8, "L")
    elif mode == "RGB":
        img = Image.fromarray(np.stack([u8] * 3, -1), "RGB")
    elif mode == "RGBA":
        rgba = np.stack([u8, u8, u8, np.full_like(u8, 255)], -1)
        img = Image.fromarray(rgba, "RGBA")
    else:
        raise ValueError(f"unsupported mode: {mode}")
    img.save(path)
