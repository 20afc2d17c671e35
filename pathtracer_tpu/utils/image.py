"""Image IO and comparison metrics.

Replaces the reference's Canvas2D ``putImageData`` display path
(``src/program-raymarch.ts:295-318``) with PNG files written from the host.
The reference parses an ``output`` path from the INI but never writes it
(``parse-ini.ts:39``); here the CLI actually honors it.
"""

from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] float in [0, ~] -> uint8 with clamping (Uint8ClampedArray)."""
    return np.clip(np.asarray(img) * 255.0, 0.0, 255.0).astype(np.uint8)


def write_png(path: str, img: np.ndarray) -> None:
    """Write an [H, W, 3] float (linear, post-tonemap) image as PNG."""
    from PIL import Image

    arr = img if img.dtype == np.uint8 else to_uint8(img)
    Image.fromarray(arr, mode="RGB").save(path)


def read_png(path: str) -> np.ndarray:
    """Read a PNG into an [H, W, 3] float array in [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32)
    return arr / 255.0


def mse(a: np.ndarray, b: np.ndarray) -> float:
    """Mean squared error between two [H, W, 3] float images in [0, 1]."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    return float(np.mean((a - b) ** 2))
