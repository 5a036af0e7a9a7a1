"""AOT serving bundles (exemplar_vae_tpu/serve.py): export -> reload ->
replay fidelity, with NO model code on the load path (the deserialized
StableHLO program is what runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.models import create_model
from exemplar_vae_tpu.serve import (
    ServingBundle, export_serving_bundle, make_serving_fns)
from exemplar_vae_tpu.train.evaluation import make_eval_bank_fn, make_iwae_fn
from exemplar_vae_tpu.train.loss import Bank


@pytest.fixture(scope="module")
def trained():
    cfg = Config(model_name="vae", prior="exemplar_prior", hidden_size=32,
                 z1_size=8, S=16, MB=8, test_batch_size=8,
                 dataset_name="synthetic", use_pallas_prior=False)
    m = create_model(cfg)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (24, 28, 28, 1))
    x = (x > 0.5).astype(np.float32)  # eval-protocol binary data
    v = m.init(k, x, k)
    bank = Bank(images=jnp.asarray(x), data_idx=jnp.arange(24, dtype=jnp.int32),
                valid=jnp.ones(24, bool), cache_means=None, n_effective=24)
    eb = make_eval_bank_fn(m, cfg)(v["params"], bank, k)
    return cfg, m, v["params"], x, eb


def test_bundle_roundtrip_matches_direct_fns(trained, tmp_path):
    """Exported+deserialized programs == the python functions they were
    exported from, to float32 noise (the deserialized StableHLO re-optimizes
    with different fusions, so a few ULP wiggle — observed max 2.4e-7)."""
    cfg, m, params, x, eb = trained
    out = str(tmp_path / "bundle")
    export_serving_bundle(m, cfg, params, out,
                          bank_means=eb.cache_means, data_idx=eb.data_idx,
                          valid=eb.valid, n_effective=eb.n_effective,
                          n_gen=5, ref_batch=4, score_chunk=4,
                          s_total=8, r=4)
    b = ServingBundle.load(out)
    gen_fn, ref_fn, score_fn = make_serving_fns(
        m, cfg, int(eb.n_effective), 5, rounds=2, r=4)

    key = jax.random.PRNGKey(3)
    got = np.asarray(b.generate(key))
    want = np.asarray(gen_fn(params, eb.cache_means, key))
    assert got.shape == (5, 28, 28, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)

    got = np.asarray(b.reference_generate(x[:4], key))
    want = np.asarray(ref_fn(params, x[:4], key))
    np.testing.assert_allclose(got, want, atol=1e-6)

    got = np.asarray(b._fns["score_nll"](
        params, x[:4], key, eb.cache_means, eb.data_idx, eb.valid))
    want = np.asarray(score_fn(params, x[:4], key, eb.cache_means,
                               eb.data_idx, eb.valid))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bundle_generate_matches_sampling_api(trained, tmp_path):
    """Serving generation (cached exemplar means) == the library's
    generate_x (on-the-fly encode) to float noise: eval preprocessing is
    deterministic, so the cached means equal a fresh re-encode, and the
    4-way key-split discipline is mirrored."""
    from exemplar_vae_tpu.train import sampling
    cfg, m, params, x, eb = trained
    out = str(tmp_path / "bundle2")
    export_serving_bundle(m, cfg, params, out,
                          bank_means=eb.cache_means, data_idx=eb.data_idx,
                          valid=eb.valid, n_effective=eb.n_effective,
                          n_gen=6, ref_batch=4, score_chunk=4)
    b = ServingBundle.load(out)
    key = jax.random.PRNGKey(11)
    got = np.asarray(b.generate(key))
    want = np.asarray(sampling.generate_x(m, params, cfg, 6, key,
                                          bank_images_raw=x, n_valid=24))
    np.testing.assert_allclose(got, want, atol=1e-6)

    ref = np.asarray(b.reference_generate(x[:4], key))
    want_ref = np.asarray(sampling.reference_based_generation_x(
        m, params, cfg, key, x[:4]))
    np.testing.assert_allclose(ref, want_ref, atol=1e-6)


def test_bundle_score_matches_library_iwae(trained, tmp_path):
    """score_nll over chunks (incl. a padded tail) == make_iwae_fn at the
    same S/r/chunk: same per-chunk key fold-in, padded rows discarded."""
    cfg, m, params, x, eb = trained
    out = str(tmp_path / "bundle3")
    export_serving_bundle(m, cfg, params, out,
                          bank_means=eb.cache_means, data_idx=eb.data_idx,
                          valid=eb.valid, n_effective=eb.n_effective,
                          n_gen=4, ref_batch=4, score_chunk=8,
                          s_total=16, r=8)
    b = ServingBundle.load(out)
    key = jax.random.PRNGKey(5)
    mean_b, per_b = b.score_nll(x[:20], key)  # 20 = 2 full chunks + tail 4
    iwae = make_iwae_fn(m, cfg)
    mean_l, per_l = iwae(params, x[:20], key, eb, s_total=16, chunk=8, r=8)
    # padded tail rows change nothing for the true rows (row-independent)
    np.testing.assert_allclose(per_b, per_l, rtol=1e-5, atol=1e-5)
    assert np.isfinite(mean_b)


def test_multi_platform_export_replays_on_cpu(trained, tmp_path):
    """platforms=('cpu','tpu') lowers one artifact for both targets (works
    from a CPU host — no TPU needed to EXPORT) and replays on the CPU
    backend. Requires the scan prior impl (the Pallas kernel only lowers
    for TPU — serve.py module docstring)."""
    cfg, m, params, x, eb = trained
    assert not cfg.use_pallas_prior
    out = str(tmp_path / "bundle_mp")
    man = export_serving_bundle(m, cfg, params, out,
                                bank_means=eb.cache_means,
                                data_idx=eb.data_idx, valid=eb.valid,
                                n_effective=eb.n_effective,
                                n_gen=3, ref_batch=4, score_chunk=4,
                                s_total=4, r=2, platforms=("cpu", "tpu"))
    assert man["platforms"] == ["cpu", "tpu"]
    b = ServingBundle.load(out)
    imgs = np.asarray(b.generate(jax.random.PRNGKey(1)))
    assert imgs.shape == (3, 28, 28, 1) and np.isfinite(imgs).all()
    mean, per = b.score_nll(x[:6], jax.random.PRNGKey(2))
    assert np.isfinite(per).all()


@pytest.mark.parametrize("model_name", ["hvae_2level", "convhvae_2level",
                                        "pixelhvae_2level"])
def test_bundle_exports_every_family(model_name, tmp_path):
    """Every model family exports and replays (generate incl. PixelHVAE's
    autoregressive raster scan, conditioned generate, IWAE score)."""
    cfg = Config(model_name=model_name, prior="exemplar_prior",
                 hidden_size=16, z1_size=4, z2_size=4, S=4, MB=2,
                 dataset_name="synthetic", use_pallas_prior=False,
                 pixelcnn_features=8, pixelcnn_layers=2)
    m = create_model(cfg)
    k = jax.random.PRNGKey(0)
    x = (jax.random.uniform(k, (8, 28, 28, 1)) > 0.5).astype(np.float32)
    v = m.init(k, x, k)
    bank = Bank(images=jnp.asarray(x), data_idx=jnp.arange(8, dtype=jnp.int32),
                valid=jnp.ones(8, bool), cache_means=None, n_effective=8)
    eb = make_eval_bank_fn(m, cfg)(v["params"], bank, k)
    out = str(tmp_path / model_name)
    export_serving_bundle(m, cfg, v["params"], out,
                          bank_means=eb.cache_means, data_idx=eb.data_idx,
                          valid=eb.valid, n_effective=8,
                          n_gen=2, ref_batch=2, score_chunk=2,
                          s_total=4, r=2)
    b = ServingBundle.load(out)
    imgs = np.asarray(b.generate(jax.random.PRNGKey(1)))
    assert imgs.shape == (2, 28, 28, 1) and np.isfinite(imgs).all()
    ref = np.asarray(b.reference_generate(x[:2], jax.random.PRNGKey(2)))
    assert np.isfinite(ref).all()
    _, per = b.score_nll(x[:2], jax.random.PRNGKey(3))
    assert np.isfinite(per).all()


def test_continuous_bundle_scores_raw_uint8(tmp_path):
    """Continuous (CelebA-protocol) bundles export a RAW uint8 input spec —
    the (x + 0.5)/256 dequantization runs INSIDE the compiled program, so
    replay matches the live library path on the same uint8 data. A float32
    spec would make that branch unreachable and silently score 0..255
    floats unscaled (round-3 review finding). Float input is rejected
    loudly rather than silently cast."""
    from exemplar_vae_tpu.ops.preprocess import preprocess_batch
    cfg = Config(model_name="vae", prior="exemplar_prior", hidden_size=16,
                 z1_size=4, S=4, MB=2, dataset_name="synthetic",
                 use_pallas_prior=False, input_type="continuous",
                 dynamic_binarization=False)
    m = create_model(cfg)
    k = jax.random.PRNGKey(0)
    x8 = np.asarray(jax.random.randint(k, (12, 28, 28, 1), 0, 256), np.uint8)
    xf = preprocess_batch(k, jnp.asarray(x8), input_type="continuous",
                          dynamic_binarization=False, train=False)
    v = m.init(k, xf, k)
    bank = Bank(images=jnp.asarray(x8),
                data_idx=jnp.arange(12, dtype=jnp.int32),
                valid=jnp.ones(12, bool), cache_means=None, n_effective=12)
    eb = make_eval_bank_fn(m, cfg)(v["params"], bank, k)
    out = str(tmp_path / "bundle_cont")
    man = export_serving_bundle(m, cfg, v["params"], out,
                                bank_means=eb.cache_means,
                                data_idx=eb.data_idx, valid=eb.valid,
                                n_effective=12, n_gen=2, ref_batch=4,
                                score_chunk=4, s_total=4, r=2)
    assert man["x_dtype"] == "uint8"
    b = ServingBundle.load(out)
    key = jax.random.PRNGKey(5)
    _, per_b = b.score_nll(x8[:8], key)
    iwae = make_iwae_fn(m, cfg)
    _, per_l = iwae(v["params"], jnp.asarray(x8[:8]), key, eb,
                    s_total=4, chunk=4, r=2)
    np.testing.assert_allclose(per_b, np.asarray(per_l), rtol=1e-5, atol=1e-5)
    ref = np.asarray(b.reference_generate(x8[:4], key))
    assert np.isfinite(ref).all()
    with pytest.raises(ValueError, match="uint8"):
        b.score_nll(np.asarray(x8[:4], np.float32), key)
    with pytest.raises(ValueError, match="uint8"):
        b.reference_generate(np.asarray(x8[:4], np.float32), key)


def test_bundle_no_model_code_needed(trained, tmp_path):
    """The loader reconstructs params purely from the npz path keys —
    perturbing a weight changes the replayed output (weights are a live
    input, not baked constants)."""
    cfg, m, params, x, eb = trained
    out = str(tmp_path / "bundle4")
    export_serving_bundle(m, cfg, params, out,
                          bank_means=eb.cache_means, data_idx=eb.data_idx,
                          valid=eb.valid, n_effective=eb.n_effective,
                          n_gen=4, ref_batch=4, score_chunk=4)
    b = ServingBundle.load(out)
    key = jax.random.PRNGKey(2)
    base = np.asarray(b.generate(key))
    leaf_path = jax.tree_util.tree_leaves_with_path(b.params)[0][0]
    node = b.params
    for k in leaf_path[:-1]:
        node = node[k.key]
    node[leaf_path[-1].key] = node[leaf_path[-1].key] + 0.05
    changed = np.asarray(b.generate(key))
    assert not np.array_equal(base, changed)
