"""Deterministic synthetic image data.

The build environment has no network and may have no dataset files
(SURVEY.md §7.3 item 5), so every dataset has a hermetic, deterministic
synthetic fallback with the same shapes/dtypes/split sizes. Images are
class-structured mixtures of Gaussian blobs — enough signal that the VAE's
ELBO visibly improves and the exemplar-conditioned augmentation classifier
has something to learn.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

# Generation is deterministic in its arguments, so large outputs are cached
# on disk verbatim: the CelebA-shaped N=200k set costs ~417 s of np.exp on
# one core per process otherwise (measured — it dominated every config-4
# tool run's setup). Small (test-sized) sets stay uncached.
# Disk footprint: the N=200k CelebA-shaped npz is ~10 GB under ~/.cache
# with no eviction — delete ~/.cache/exemplar_vae_tpu/synth to reclaim.
_CACHE_MIN_ELEMS = 2 ** 26  # ~64 MB float32 images

# Version tag baked into every cache filename. BUMP THIS on ANY change to
# the generation algorithm below (round-4 ADVICE: a key derived only from
# call arguments silently serves stale data across algorithm changes).
_GEN_VERSION = "v1"


def _cache_dir() -> str | None:
    if os.environ.get("EVT_SYNTH_CACHE", "1") == "0":
        return None
    return os.environ.get(
        "EVT_SYNTH_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "exemplar_vae_tpu", "synth"))


def synthetic_images(n: int, h: int, w: int, c: int, *, n_classes: int = 10,
                     seed: int = 0, blobs_per_class: int = 3):
    """Returns (images float32 (n,h,w,c) in [0,1], labels int32 (n,))."""
    cache = None
    if n * h * w * c >= _CACHE_MIN_ELEMS and (cdir := _cache_dir()):
        cache = os.path.join(
            cdir, f"synth_{_GEN_VERSION}_{n}x{h}x{w}x{c}_cls{n_classes}"
                  f"_blob{blobs_per_class}_seed{seed}.npz")
        if os.path.exists(cache):
            with np.load(cache) as z:
                return z["x"], z["y"]

    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, n).astype(np.int32)

    # fixed per-class blob layout (shared across samples of the class)
    class_rng = np.random.default_rng(12345)
    centers = class_rng.uniform(0.15, 0.85, (n_classes, blobs_per_class, 2))
    sigmas = class_rng.uniform(0.06, 0.14, (n_classes, blobs_per_class))
    amps = class_rng.uniform(0.6, 1.0, (n_classes, blobs_per_class))

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy /= max(h - 1, 1)
    xx /= max(w - 1, 1)

    # per-sample jitter of the class layout — everything float32 and chunked:
    # float64 temporaries at (200k, 64, 64) scale cost tens of GB of
    # bandwidth and took >10 min to generate
    jitter = rng.normal(0.0, 0.04, (n, blobs_per_class, 2)).astype(np.float32)
    cy = (centers[labels, :, 0] + jitter[:, :, 0]).astype(np.float32)
    cx = (centers[labels, :, 1] + jitter[:, :, 1]).astype(np.float32)
    sg = sigmas[labels].astype(np.float32)
    am = (amps[labels] * rng.uniform(0.8, 1.2, (n, blobs_per_class))
          ).astype(np.float32)
    out = np.empty((n, h, w, c), np.float32)
    phase = (0.6 + 0.4 * np.cos(np.arange(c, dtype=np.float32)[None, :]
                                + labels[:, None].astype(np.float32) * 0.7)
             ).astype(np.float32)                      # (n, c)
    chunk = 16384
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        imgs = np.zeros((e - s, h, w), np.float32)
        for b in range(blobs_per_class):
            d2 = (yy[None] - cy[s:e, b, None, None]) ** 2 + \
                 (xx[None] - cx[s:e, b, None, None]) ** 2
            inv = (-0.5 / sg[s:e, b, None, None] ** 2).astype(np.float32)
            imgs += am[s:e, b, None, None] * np.exp(d2 * inv)
        np.clip(imgs, 0.0, 1.0, out=imgs)
        if c == 1:
            out[s:e, ..., 0] = imgs
        else:
            for k in range(c):
                np.clip(imgs * phase[s:e, k, None, None], 0, 1,
                        out=out[s:e, ..., k])

    if cache is not None:
        # atomic publish: concurrent generators race benignly (identical
        # bytes), a crashed writer leaves only a tmp file behind
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(cache), suffix=".tmp")
        os.close(fd)
        try:
            with open(tmp, "wb") as fh:
                np.savez(fh, x=out, y=labels)
            os.replace(tmp, cache)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
    return out, labels
