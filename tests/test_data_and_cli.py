"""Loader contract + reference-CLI compatibility + sampling APIs."""

import subprocess
import sys

import jax
import numpy as np
import pytest

from exemplar_vae_tpu.config import Config, config_from_args, reference_arg_parser
from exemplar_vae_tpu.data import load_dataset
from exemplar_vae_tpu.data.synthetic import synthetic_images


def test_loader_contract_sets_metadata():
    for name, itype, dyn in [("dynamic_mnist", "binary", True),
                             ("static_mnist", "binary", False),
                             ("fashion_mnist", "gray", False),
                             ("omniglot", "binary", True),
                             ("celeba", "continuous", False)]:
        cfg = Config(dataset_name=name, training_set_size=64, val_set_size=16,
                     test_set_size=16)
        ds, cfg2 = load_dataset(cfg)
        assert cfg2.input_type == itype
        assert cfg2.dynamic_binarization == dyn
        c, h, w = cfg2.input_size
        assert ds.train_x.shape[1:] == (h, w, c)
        assert ds.train_idx.dtype == np.int32
        assert len(ds.train_idx) == len(ds.train_x)
        if itype == "continuous" and ds.source == "synthetic":
            assert ds.train_x.dtype == np.uint8


def _write_idx(path, arr):
    import struct
    arr = np.asarray(arr, np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x800 | arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


def test_dynamic_mnist_from_idx_files_end_to_end(tmp_path):
    """Fabricated idx-ubyte train/t10k files drive the REAL loader path:
    val carve-out from the train tail, labels kept, eval splits Bernoulli-
    binarized once with the fixed seed, and one Experiment epoch trains."""
    rng = np.random.default_rng(0)
    _write_idx(tmp_path / "train-images-idx3-ubyte",
               rng.integers(0, 256, (200, 28, 28)))
    _write_idx(tmp_path / "train-labels-idx1-ubyte",
               rng.integers(0, 10, (200,)))
    _write_idx(tmp_path / "t10k-images-idx3-ubyte",
               rng.integers(0, 256, (40, 28, 28)))
    _write_idx(tmp_path / "t10k-labels-idx1-ubyte",
               rng.integers(0, 10, (40,)))
    cfg = Config(dataset_name="dynamic_mnist", data_dir=str(tmp_path),
                 val_set_size=50, number_components=150, hidden_size=16,
                 z1_size=4, batch_size=25, S=2, MB=2, test_batch_size=20,
                 use_pallas_prior=False, prior_block_n=32,
                 exact_reencode_chunk=32, snapshot_dir=str(tmp_path / "snap"))
    ds, cfg2 = load_dataset(cfg)
    assert ds.source == "real"
    assert len(ds.train_x) == 150 and len(ds.val_x) == 50
    assert ds.train_labels is not None
    assert set(np.unique(ds.val_x)) <= {0.0, 1.0}   # eval binarized at load
    assert ds.train_x.max() <= 1.0                  # train stays gray
    from exemplar_vae_tpu.train.trainer import Experiment
    exp = Experiment(cfg, verbose=False)
    m = exp.train_epoch()
    assert np.isfinite(m["loss"])


def test_omniglot_from_chardata_mat(tmp_path):
    """Fabricated chardata.mat exercises the scipy loader + the (784, n)
    column-major reshape convention + the background/eval split carve-out."""
    scipy_io = pytest.importorskip("scipy.io")
    rng = np.random.default_rng(1)
    data = rng.random((784, 120)).astype(np.float32)     # (pixels, n) layout
    testdata = rng.random((784, 30)).astype(np.float32)
    scipy_io.savemat(tmp_path / "chardata.mat",
                     {"data": data, "testdata": testdata})
    cfg = Config(dataset_name="omniglot", data_dir=str(tmp_path),
                 val_set_size=12, test_set_size=30)
    ds, cfg2 = load_dataset(cfg)
    assert ds.source == "real"
    assert ds.train_x.shape == (108, 28, 28, 1)          # 120 - 12 val
    assert ds.test_x.shape == (30, 28, 28, 1)
    # column-major PER IMAGE: image k is column k of the mat, with its 784
    # pixels unflattened in Fortran order (the lineage loader re-flattens
    # each image with order='F'); a C-order unflatten would transpose
    # every image's strokes
    want = data[:, 0].reshape(28, 28, order="F")
    np.testing.assert_allclose(np.asarray(ds.train_x[0, :, :, 0]), want)
    # (test split can't be pixel-pinned the same way: eval splits are
    # binarized once at load with EVAL_BIN_SEED — the train pin above
    # covers the shared reshape path)


def test_eval_only_rescoring_matches_training_run(tmp_path):
    """--eval_only restores the final checkpoint, skips training, and
    reproduces the training run's final_evaluation exactly (the final-eval
    key derives from cfg.seed, so re-scoring is deterministic); it honors
    --S overrides and fails loudly with no checkpoint."""
    import main as main_mod
    args = ["--dataset_name", "synthetic", "--training_set_size", "96",
            "--number_components", "96", "--val_set_size", "32",
            "--test_set_size", "32", "--batch_size", "32",
            "--epochs", "1", "--warmup", "1", "--S", "4", "--MB", "4",
            "--hidden_size", "16", "--z1_size", "4",
            "--snapshot_dir", str(tmp_path / "snap")]
    trained = main_mod.main(args)
    rescored = main_mod.main(args + ["--eval_only"])
    assert rescored["test_nll"] == pytest.approx(trained["test_nll"],
                                                 rel=1e-6)
    assert rescored["best_val_loss"] == pytest.approx(
        trained["best_val_loss"], rel=1e-6)
    # a different S re-scores (different estimate, still finite)
    s8 = main_mod.main(args + ["--eval_only", "--S", "8"])
    assert np.isfinite(s8["test_nll"])
    # no checkpoint -> loud failure
    with pytest.raises(SystemExit, match="no restorable checkpoint"):
        main_mod.main(args + ["--eval_only",
                              "--snapshot_dir", str(tmp_path / "empty")])


def test_celeba_from_npz_triple(tmp_path):
    rng = np.random.default_rng(2)
    for s, n in (("train", 60), ("valid", 10), ("test", 12)):
        np.savez(tmp_path / f"celeba_{s}.npz",
                 x=rng.integers(0, 256, (n, 64, 64, 3), dtype=np.uint8))
    cfg = Config(dataset_name="celeba", data_dir=str(tmp_path))
    ds, cfg2 = load_dataset(cfg)
    assert ds.source == "real"
    assert ds.train_x.shape == (60, 64, 64, 3)
    assert ds.train_x.dtype == np.uint8                  # raw bank contract
    assert cfg2.input_type == "continuous"


def test_synthetic_deterministic():
    a, la = synthetic_images(16, 14, 14, 1, seed=3)
    b, lb = synthetic_images(16, 14, 14, 1, seed=3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(la, lb)
    assert a.min() >= 0 and a.max() <= 1


def test_synthetic_disk_cache_roundtrip(tmp_path, monkeypatch):
    # large generations are cached on disk (the N=200k set costs ~7 min of
    # np.exp per process otherwise); cached bytes must be verbatim
    from exemplar_vae_tpu.data import synthetic as syn
    monkeypatch.setenv("EVT_SYNTH_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(syn, "_CACHE_MIN_ELEMS", 1)
    a, la = syn.synthetic_images(16, 14, 14, 1, seed=3)
    cached = list(tmp_path.glob("synth_*.npz"))
    assert len(cached) == 1 and not list(tmp_path.glob("*.tmp"))
    b, lb = syn.synthetic_images(16, 14, 14, 1, seed=3)  # cache hit
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(la, lb)
    # cache off-switch bypasses the file
    monkeypatch.setenv("EVT_SYNTH_CACHE", "0")
    c, _ = syn.synthetic_images(16, 14, 14, 1, seed=3)
    np.testing.assert_array_equal(a, c)


def test_reference_cli_flags_accepted():
    """The reference's launch command parses unchanged (SURVEY.md §5)."""
    ns = reference_arg_parser().parse_args([
        "--dataset_name", "dynamic_mnist", "--model_name", "vae",
        "--prior", "exemplar_prior", "--number_components", "25000",
        "--approximate_prior", "--approximate_k", "10",
        "--z1_size", "40", "--z2_size", "40", "--hidden_size", "300",
        "--batch_size", "100", "--lr", "0.0005", "--epochs", "2000",
        "--warmup", "100", "--early_stopping_epochs", "50",
        "--S", "5000", "--MB", "500", "--seed", "14", "--no_cuda",
    ])
    cfg = config_from_args(ns)
    assert cfg.prior == "exemplar_prior"
    assert cfg.number_components == 25000
    assert cfg.approximate_prior and cfg.approximate_k == 10
    assert cfg.lr == 5e-4 and cfg.warmup == 100


def test_config_json_roundtrip():
    cfg = Config(dataset_name="omniglot", mesh_shape=(4,))
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg == cfg2


def test_experiment_name_varies_with_flags():
    a = Config(prior="standard").experiment_name()
    b = Config(prior="exemplar_prior").experiment_name()
    assert a != b


def test_config_rejects_enum_typos():
    """Programmatic Configs validate enum-ish fields at construction: a
    typo like approximate_support='batch-union' used to silently run the
    per_row branch (the A/B would have compared per_row against itself)."""
    import pytest as _pytest
    for field, bad in [("approximate_support", "batch-union"),
                       ("prior", "exemplar"),
                       ("input_type", "grey"),
                       ("checkpoint_backend", "orbax2"),
                       ("compute_dtype", "float16")]:
        with _pytest.raises(ValueError, match=field):
            Config(**{field: bad})


def test_sampling_apis(tmp_path):
    from exemplar_vae_tpu.train import sampling
    from exemplar_vae_tpu.models import create_model
    cfg = Config(model_name="vae", prior="exemplar_prior", hidden_size=32,
                 z1_size=8)
    m = create_model(cfg)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (20, 28, 28, 1))
    v = m.init(k, x, k)
    gen = sampling.generate_x(m, v["params"], cfg, 7, k, x)
    assert gen.shape == (7, 28, 28, 1)
    ref = sampling.reference_based_generation_x(m, v["params"], cfg, k,
                                                x[:3], n_per_ref=4)
    assert ref.shape == (12, 28, 28, 1)
    orig, rec = sampling.reconstruct_x(m, v["params"], cfg, k, x[:5])
    assert rec.shape == (5, 28, 28, 1)


def test_plots_grid(tmp_path):
    from exemplar_vae_tpu.train.plots import make_grid, save_grid
    imgs = np.random.default_rng(0).random((9, 8, 8, 1)).astype(np.float32)
    g = make_grid(imgs)
    assert g.ndim == 3
    p = tmp_path / "g.png"
    save_grid(imgs, str(p))
    assert p.exists()


def test_prepare_celeba_roundtrip(tmp_path):
    """tools/prepare_celeba.py -> loader consumes the npz output."""
    from PIL import Image
    import sys
    sys.path.insert(0, ".")
    from tools.prepare_celeba import main as prep_main
    img_dir = tmp_path / "raw"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(10):
        arr = rng.integers(0, 255, (178, 218, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.jpg")
    out = tmp_path / "data"
    prep_main(["--img_dir", str(img_dir), "--out", str(out)])
    cfg = Config(dataset_name="celeba", data_dir=str(out))
    ds, cfg2 = load_dataset(cfg)
    assert ds.source == "real"
    assert ds.train_x.shape == (8, 64, 64, 3)
    assert ds.train_x.dtype == np.uint8
    assert ds.val_x.shape[0] == 1 and ds.test_x.shape[0] == 1


def test_eval_splits_binarized_once_at_load():
    """Dynamic-binarization datasets: val/test are fixed 0/1 samples drawn
    once at load with EVAL_BIN_SEED (the reference's one-time seeded eval
    binarization [U]); the train split keeps its gray levels for the fresh
    per-step sample."""
    cfg = Config(dataset_name="synthetic", training_set_size=64,
                 val_set_size=16, test_set_size=16)
    ds1, _ = load_dataset(cfg)
    ds2, _ = load_dataset(cfg)
    assert set(np.unique(ds1.val_x)) <= {0.0, 1.0}
    assert set(np.unique(ds1.test_x)) <= {0.0, 1.0}
    assert len(np.unique(ds1.train_x)) > 2
    np.testing.assert_array_equal(ds1.val_x, ds2.val_x)
    np.testing.assert_array_equal(ds1.test_x, ds2.test_x)
