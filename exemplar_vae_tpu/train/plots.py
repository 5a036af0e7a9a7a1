"""Image-grid artifacts (reference: utils/plot_images.py::plot_images [U]).

Matplotlib-free on the hot path: grids are assembled in numpy and written as
PNG via PIL (matplotlib is available but heavyweight; PIL keeps artifact
writing off the critical path)."""

from __future__ import annotations

import math

import numpy as np


def make_grid(images: np.ndarray, ncol: int = None) -> np.ndarray:
    """(N, H, W, C) floats [0,1] -> (GH, GW, C) grid with 2px separators."""
    images = np.asarray(images, np.float32)
    n, h, w, c = images.shape
    if n == 0:
        # empty batch -> 1-cell blank grid (artifact writing must never
        # crash a finished run on a zero-sample config)
        return np.ones((h + 4, w + 4, c), np.float32)
    if ncol is not None and ncol < 1:
        raise ValueError(f"ncol must be >= 1, got {ncol}")
    ncol = ncol or int(math.ceil(math.sqrt(n)))
    nrow = int(math.ceil(n / ncol))
    pad = 2
    grid = np.ones((nrow * (h + pad) + pad, ncol * (w + pad) + pad, c),
                   np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y:y + h, x:x + w] = np.clip(images[i], 0, 1)
    return grid


def save_grid(images: np.ndarray, path: str, ncol: int = None):
    from PIL import Image
    grid = make_grid(images, ncol)
    arr = (grid * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
