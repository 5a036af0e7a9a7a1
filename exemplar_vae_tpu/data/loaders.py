"""Dataset ingest (reference: utils/load_data.py::load_dataset [U]).

Contract preserved (SURVEY.md §0.3): ``load_dataset(cfg)`` returns the three
splits plus a Config updated with ``input_size`` / ``input_type`` /
``dynamic_binarization``, and every training example carries its global
index (the exemplar bank and LOO mask address exemplars by it).

TPU-native difference: instead of host-side DataLoaders, splits are numpy
arrays that the trainer moves to device ONCE; binarization/dequantization is
jit-fused on device (ops/preprocess.py).

File formats accepted when present under ``cfg.data_dir`` (all reference
formats): MNIST/Fashion idx-ubyte (optionally .gz), Larochelle
``binarized_mnist_{train,valid,test}.amat``, Omniglot ``chardata.mat``,
CelebA as ``celeba_{train,valid,test}.npz`` (key 'x', uint8 NHWC 64x64), or
a generic ``{name}.npz`` with keys train_x/val_x/test_x[/labels].
With no files, a deterministic synthetic fallback with matching
shapes/splits is used (data/synthetic.py) and ``source='synthetic'``.
"""

from __future__ import annotations

import gzip
import os
import struct
import zlib
from typing import NamedTuple, Optional

import numpy as np

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.data.synthetic import synthetic_images


# Fixed seed for the ONE-TIME Bernoulli binarization of val/test splits of
# dynamically-binarized datasets. The reference seeds numpy with 777 before
# binomial-sampling the eval splits at load time (utils/load_data.py::
# load_dynamic_mnist / load_omniglot [U]) so evaluation targets are identical
# across epochs and runs; training data stays gray and is re-sampled per step.
EVAL_BIN_SEED = 777


def binarize_eval_split(x: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """One-time Bernoulli sample of an eval split's gray levels -> float32 0/1."""
    xf = x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else \
        np.asarray(x, np.float32)
    return (rng.random_sample(xf.shape) < xf).astype(np.float32)


class DataSplits(NamedTuple):
    train_x: np.ndarray              # (N, H, W, C) float32 [0,1] or uint8
    train_idx: np.ndarray            # (N,) int32 global indices
    train_labels: Optional[np.ndarray]
    val_x: np.ndarray
    val_labels: Optional[np.ndarray]
    test_x: np.ndarray
    test_labels: Optional[np.ndarray]
    source: str                      # 'real' | 'synthetic'


_META = {
    # name: (input_type, dynamic_binarization, (C, H, W))
    "static_mnist": ("binary", False, (1, 28, 28)),
    "dynamic_mnist": ("binary", True, (1, 28, 28)),
    "fashion_mnist": ("gray", False, (1, 28, 28)),
    "omniglot": ("binary", True, (1, 28, 28)),
    "celeba": ("continuous", False, (3, 64, 64)),
    "synthetic": ("binary", True, (1, 28, 28)),
    "synthetic_gray": ("gray", False, (1, 28, 28)),
    "synthetic_continuous": ("continuous", False, (3, 64, 64)),
}


def dataset_meta(name: str):
    if name not in _META:
        raise ValueError(f"unknown dataset: {name} (know {sorted(_META)})")
    return _META[name]


# --------------------------------------------------------------------------
# file readers
# --------------------------------------------------------------------------

def _open_maybe_gz(path):
    return gzip.open(path, "rb") if path.endswith(".gz") else open(path, "rb")


def _read_idx(path):
    """Parse an IDX (MNIST-style) file — native C++ fast path, python
    fallback (data/native_ingest.py)."""
    if not path.endswith(".gz"):
        from exemplar_vae_tpu.data.native_ingest import load_idx
        arr = load_idx(path)
        if arr is not None:
            return arr
    with _open_maybe_gz(path) as f:
        data = f.read()
    magic, = struct.unpack(">I", data[:4])
    ndim = magic & 0xFF
    dims = struct.unpack(">" + "I" * ndim, data[4:4 + 4 * ndim])
    arr = np.frombuffer(data, np.uint8, offset=4 + 4 * ndim)
    return arr.reshape(dims)


def _find(data_dir, names):
    for n in names:
        for cand in (n, n + ".gz"):
            p = os.path.join(data_dir, cand)
            if os.path.exists(p):
                return p
    return None


def _load_mnist_like(data_dir, prefix):
    """idx-ubyte train/test pair -> (train70k-style arrays) or None."""
    tr_x = _find(data_dir, [f"{prefix}train-images-idx3-ubyte",
                            f"{prefix}train-images.idx3-ubyte"])
    tr_y = _find(data_dir, [f"{prefix}train-labels-idx1-ubyte",
                            f"{prefix}train-labels.idx1-ubyte"])
    te_x = _find(data_dir, [f"{prefix}t10k-images-idx3-ubyte",
                            f"{prefix}t10k-images.idx3-ubyte"])
    te_y = _find(data_dir, [f"{prefix}t10k-labels-idx1-ubyte",
                            f"{prefix}t10k-labels.idx1-ubyte"])
    if not (tr_x and te_x):
        return None
    xtr = _read_idx(tr_x).astype(np.float32)[..., None] / 255.0
    xte = _read_idx(te_x).astype(np.float32)[..., None] / 255.0
    ytr = _read_idx(tr_y).astype(np.int32) if tr_y else None
    yte = _read_idx(te_y).astype(np.int32) if te_y else None
    return xtr, ytr, xte, yte


def _load_static_mnist(data_dir):
    """Larochelle fixed binarization .amat files (reference
    load_static_mnist [U])."""
    paths = [os.path.join(data_dir, f"binarized_mnist_{s}.amat")
             for s in ("train", "valid", "test")]
    if not all(os.path.exists(p) for p in paths):
        return None
    from exemplar_vae_tpu.data.native_ingest import load_amat
    outs = []
    for p in paths:
        arr = load_amat(p, n_cols=784)  # C++ streaming parser, numpy fallback
        outs.append(arr.reshape(-1, 28, 28, 1))
    return outs


def _load_generic_npz(data_dir, name):
    p = os.path.join(data_dir, f"{name}.npz")
    if not os.path.exists(p):
        return None
    z = np.load(p)
    need = ("train_x", "val_x", "test_x")
    if not all(k in z for k in need):
        return None
    return (z["train_x"], z.get("train_labels"), z["val_x"],
            z.get("val_labels"), z["test_x"], z.get("test_labels"))


def _load_omniglot(data_dir):
    p = os.path.join(data_dir, "chardata.mat")
    if not os.path.exists(p):
        return None
    from scipy.io import loadmat
    raw = loadmat(p)
    # reference reshape convention [U]: chardata.mat stores (784, n) with
    # each image's 784 pixels in COLUMN-major order (the lineage's loader
    # re-flattens per image with order='F', i.e. transposes each 28x28) —
    # a C-order reshape here would hand conv models transposed strokes.
    # Session-0 checklist item: verify against the real load_omniglot.
    def conv(d):
        imgs = d.T.reshape(-1, 28, 28).transpose(0, 2, 1)
        return imgs[..., None].astype(np.float32)
    train = conv(raw["data"])
    test = conv(raw["testdata"])
    return train, test


def _load_celeba(data_dir):
    parts = []
    for s in ("train", "valid", "test"):
        p = os.path.join(data_dir, f"celeba_{s}.npz")
        if not os.path.exists(p):
            return None
        parts.append(np.load(p)["x"])
    return parts  # uint8 NHWC


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def load_dataset(cfg: Config):
    """-> (DataSplits, Config with input metadata filled in)."""
    name = cfg.dataset_name
    input_type, dyn_bin, (c, h, w) = dataset_meta(name)
    if cfg.dynamic_binarization_override is not None:
        dyn_bin = cfg.dynamic_binarization_override
    cfg = cfg.replace(input_size=(c, h, w), input_type=input_type,
                      dynamic_binarization=dyn_bin)
    dd = cfg.data_dir

    splits = None
    if name in ("dynamic_mnist", "fashion_mnist"):
        prefix = "fashion-" if name == "fashion_mnist" else ""
        got = (_load_mnist_like(dd, prefix)
               or (_load_mnist_like(os.path.join(dd, name), "")
                   if os.path.isdir(os.path.join(dd, name)) else None))
        if got is not None:
            xtr, ytr, xte, yte = got
            # split by index, not negative slices: xtr[:-0] is EMPTY, so
            # val_set_size=0 would invert the split (no train, all val)
            cut = len(xtr) - cfg.val_set_size
            if cut <= 0:
                raise ValueError(
                    f"val_set_size={cfg.val_set_size} consumes the whole "
                    f"training set ({len(xtr)} examples)")
            splits = (xtr[:cut], (ytr[:cut] if ytr is not None else None),
                      xtr[cut:], (ytr[cut:] if ytr is not None else None),
                      xte, yte, "real")
    elif name == "static_mnist":
        got = _load_static_mnist(dd)
        if got is not None:
            tr, va, te = got
            splits = (tr, None, va, None, te, None, "real")
    elif name == "omniglot":
        got = _load_omniglot(dd)
        if got is not None:
            tr, te = got
            # reference carve-out: 1345 val points [U]; floor at 1 so a
            # tiny file never hits the -0-slice inversion, cap to keep
            # at least one training point
            n_val = max(1, min(1345, len(tr) // 10))
            cut = max(1, len(tr) - n_val)
            splits = (tr[:cut], None, tr[cut:], None, te, None, "real")
    elif name == "celeba":
        got = _load_celeba(dd)
        if got is not None:
            tr, va, te = got
            splits = (tr, None, va, None, te, None, "real")

    if splits is None:
        gen = _load_generic_npz(dd, name)
        if gen is not None:
            splits = gen + ("real",)

    if splits is None:
        n_tr = cfg.training_set_size
        n_val, n_te = cfg.val_set_size, cfg.test_set_size
        # stable across processes (hash() is randomized per interpreter)
        x, y = synthetic_images(n_tr + n_val + n_te, h, w, c,
                                seed=1000 + zlib.crc32(name.encode()) % 1000)
        if input_type == "binary" and not dyn_bin:
            rng = np.random.default_rng(7)
            x = (rng.random(x.shape) < x).astype(np.float32)
        if input_type == "continuous":
            x = (x * 255).astype(np.uint8)
        splits = (x[:n_tr], y[:n_tr], x[n_tr:n_tr + n_val],
                  y[n_tr:n_tr + n_val], x[n_tr + n_val:], y[n_tr + n_val:],
                  "synthetic")

    tr_x, tr_y, va_x, va_y, te_x, te_y, source = splits
    tr_x = np.ascontiguousarray(tr_x)
    if input_type == "binary" and dyn_bin:
        # one-time fixed-seed eval binarization (reference protocol; see
        # EVAL_BIN_SEED above). val first, then test, from ONE stream —
        # order matters for bit-reproducibility.
        rng = np.random.RandomState(EVAL_BIN_SEED)
        va_x = binarize_eval_split(va_x, rng)
        te_x = binarize_eval_split(te_x, rng)
    ds = DataSplits(
        train_x=tr_x,
        train_idx=np.arange(len(tr_x), dtype=np.int32),
        train_labels=tr_y,
        val_x=np.ascontiguousarray(va_x), val_labels=va_y,
        test_x=np.ascontiguousarray(te_x), test_labels=te_y,
        source=source,
    )
    return ds, cfg
