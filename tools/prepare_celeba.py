"""CelebA preprocessing (reference: clean_celeba.py [name L, SURVEY.md §2 C12]).

Converts a directory of raw CelebA images (+ optional
``list_eval_partition.txt``) into the ``celeba_{train,valid,test}.npz``
files the loader consumes: center-crop 148x148 (the standard CelebA crop),
resize to 64x64, uint8 NHWC under key 'x'.

    python tools/prepare_celeba.py --img_dir img_align_celeba \
        [--partition list_eval_partition.txt] --out datasets
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def process_image(path, crop: int = 148, size: int = 64) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    w, h = img.size
    c = min(crop, w, h)
    left, top = (w - c) // 2, (h - c) // 2
    img = img.crop((left, top, left + c, top + c)).resize(
        (size, size), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def load_partition(path):
    """list_eval_partition.txt: '<filename> <0|1|2>' per line."""
    part = {}
    with open(path) as f:
        for line in f:
            bits = line.split()
            if len(bits) == 2:
                part[bits[0]] = int(bits[1])
    return part


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--img_dir", required=True)
    p.add_argument("--partition", default=None,
                   help="list_eval_partition.txt; default 80/10/10 by order")
    p.add_argument("--out", default="datasets")
    p.add_argument("--crop", type=int, default=148)
    p.add_argument("--size", type=int, default=64)
    ns = p.parse_args(argv)

    names = sorted(os.listdir(ns.img_dir))
    names = [n for n in names if n.lower().endswith((".jpg", ".jpeg", ".png"))]
    part = load_partition(ns.partition) if ns.partition else None
    splits = {0: [], 1: [], 2: []}
    for i, n in enumerate(names):
        if part is not None:
            s = part.get(n, 0)
        else:
            s = 0 if i < 0.8 * len(names) else (1 if i < 0.9 * len(names) else 2)
        splits[s].append(process_image(os.path.join(ns.img_dir, n),
                                       ns.crop, ns.size))
    os.makedirs(ns.out, exist_ok=True)
    for s, tag in [(0, "train"), (1, "valid"), (2, "test")]:
        arr = np.stack(splits[s]) if splits[s] else np.zeros(
            (0, ns.size, ns.size, 3), np.uint8)
        np.savez_compressed(os.path.join(ns.out, f"celeba_{tag}.npz"), x=arr)
        print(f"celeba_{tag}.npz: {arr.shape}")


if __name__ == "__main__":
    main()
