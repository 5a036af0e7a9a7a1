"""Native C++ ingest vs numpy oracles (and the lazy-compile path)."""

import gzip
import os
import struct

import numpy as np
import pytest

from exemplar_vae_tpu.data import native_ingest
from exemplar_vae_tpu.data.loaders import _read_idx


@pytest.fixture(scope="module")
def amat_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    arr = (rng.random((37, 784)) < 0.3).astype(np.float32)
    p = tmp_path_factory.mktemp("amat") / "binarized_mnist_test.amat"
    with open(p, "w") as f:
        for row in arr:
            f.write(" ".join("1" if v else "0" for v in row) + " \n")
    return str(p), arr


def _write_idx(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


def test_amat_native_matches_numpy(amat_file):
    path, want = amat_file
    got = native_ingest.load_amat(path, n_cols=784)
    np.testing.assert_array_equal(got, want)
    # numpy oracle agreement
    oracle = np.loadtxt(path, dtype=np.float32).reshape(-1, 784)
    np.testing.assert_array_equal(got, oracle)


def test_amat_float_tokens(tmp_path):
    p = tmp_path / "f.amat"
    with open(p, "w") as f:
        f.write("0.5 1 0.25\n0 0.125 1\n")
    got = native_ingest.load_amat(str(p), n_cols=3)
    np.testing.assert_allclose(got, [[0.5, 1, 0.25], [0, 0.125, 1]])


def test_idx_native_and_gz_fallback(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (11, 28, 28), dtype=np.uint8)
    p = tmp_path / "images-idx3-ubyte"
    _write_idx(p, arr)
    got = _read_idx(str(p))
    np.testing.assert_array_equal(got, arr)
    # gz path goes through the python parser
    pg = tmp_path / "images-idx3-ubyte.gz"
    with gzip.open(pg, "wb") as f, open(p, "rb") as src:
        f.write(src.read())
    got_gz = _read_idx(str(pg))
    np.testing.assert_array_equal(got_gz, arr)


def test_idx_non_ubyte_dtype_rejected(tmp_path):
    """An IDX file whose dtype code is not 0x08 (e.g. 0x0C = int32) must be
    REJECTED by the native parser, never silently parsed as uint8 garbage
    (total=prod(dims) bytes of a 4x-larger payload — the python fallback
    raises on reshape; the fast path must not be more permissive)."""
    from exemplar_vae_tpu.data.native_ingest import load_idx
    if native_ingest._load() is None:
        pytest.skip("native lib unavailable")
    arr = np.arange(6, dtype=">i4")
    p = tmp_path / "ints-idx1-int32"
    with open(p, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x0C, 1))
        f.write(struct.pack(">I", 6))
        f.write(arr.tobytes())
    assert load_idx(str(p)) is None


def test_make_grid_empty_batch_and_bad_ncol():
    """Artifact writing must never crash a finished run: an empty image
    batch yields a blank grid instead of a ZeroDivisionError, and an
    explicit ncol=0 errors instead of being silently coerced to auto."""
    from exemplar_vae_tpu.train.plots import make_grid
    g = make_grid(np.zeros((0, 4, 4, 1), np.float32))
    assert g.shape == (8, 8, 1) and np.isfinite(g).all()
    with pytest.raises(ValueError, match="ncol"):
        make_grid(np.zeros((3, 4, 4, 1), np.float32), ncol=0)


def test_static_mnist_loader_uses_amat(tmp_path, monkeypatch):
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.data.loaders import load_dataset
    rng = np.random.default_rng(2)
    for split, n in [("train", 40), ("valid", 10), ("test", 10)]:
        arr = (rng.random((n, 784)) < 0.3).astype(int)
        with open(tmp_path / f"binarized_mnist_{split}.amat", "w") as f:
            for row in arr:
                f.write(" ".join(str(v) for v in row) + "\n")
    cfg = Config(dataset_name="static_mnist", data_dir=str(tmp_path))
    ds, cfg2 = load_dataset(cfg)
    assert ds.source == "real"
    assert ds.train_x.shape == (40, 28, 28, 1)
    assert set(np.unique(ds.train_x)) <= {0.0, 1.0}


def test_amat_oversized_token_at_chunk_boundary_falls_back(tmp_path):
    """A token longer than the 64-byte carry slack spanning the 1 MiB read
    boundary must make the native parser bail (-1) instead of overflowing
    its buffer; load_amat then falls back to numpy and still parses
    correctly (round-2 ADVICE fix, native/ingest.cc)."""
    p = tmp_path / "long_token.amat"
    buf_size = 1 << 20
    long_tok = "0." + "0" * 90 + "1"  # 93 chars, valid float, > 64-byte carry
    # place the long token so it straddles the first fread boundary
    n_lead = (buf_size - 40) // 2  # "0 " pairs end just before the boundary
    with open(p, "w") as f:
        f.write("0 " * n_lead)
        f.write(long_tok + " ")
        tail = 3 * ((n_lead + 1) // 3 + 1) - (n_lead + 1)
        f.write("1 " * tail)  # pad so total count divides n_cols=3
    total = n_lead + 1 + tail
    assert total % 3 == 0
    got = native_ingest.load_amat(str(p), n_cols=3)
    assert got.shape == (total // 3, 3)
    flat = got.reshape(-1)
    assert flat[n_lead] == pytest.approx(float(long_tok))
    assert flat[:n_lead].sum() == 0 and flat[n_lead + 1:].sum() == tail
