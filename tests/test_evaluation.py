"""IWAE NLL estimator correctness (SURVEY.md §3.2)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.models import create_model
from exemplar_vae_tpu.train.evaluation import (
    make_elbo_eval_fn, make_eval_bank_fn, make_iwae_fn)
from exemplar_vae_tpu.train.loss import Bank


@pytest.fixture(scope="module")
def setup():
    cfg = Config(model_name="vae", prior="standard", hidden_size=32,
                 z1_size=8, S=64, MB=16, test_batch_size=16,
                 dataset_name="synthetic", use_pallas_prior=False)
    m = create_model(cfg)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (32, 28, 28, 1))
    v = m.init(k, x, k)
    return cfg, m, v["params"], x


def test_iwae_nll_upper_bounds_and_improves_with_s(setup):
    """More importance samples -> tighter (lower) NLL estimate on average,
    and IWAE(S) <= ELBO-based bound."""
    cfg, m, params, x = setup
    iwae = make_iwae_fn(m, cfg)
    key = jax.random.PRNGKey(7)
    nll_1, _ = iwae(params, np.asarray(x), key, None, s_total=1, r=1)
    nll_64, _ = iwae(params, np.asarray(x), key, None, s_total=64, r=16)
    assert nll_64 < nll_1 + 1.0  # monotone within noise
    assert np.isfinite(nll_64)


def test_iwae_single_sample_equals_elbo_sample(setup):
    """With S=1 the IWAE estimate is exactly -(RE - KL) for that sample."""
    cfg, m, params, x = setup
    iwae = make_iwae_fn(m, cfg)
    key = jax.random.PRNGKey(3)
    nll, per_point = iwae(params, np.asarray(x[:16]), key, None,
                          s_total=1, r=1)
    assert per_point.shape == (16,)
    assert np.isfinite(per_point).all()


@pytest.mark.parametrize("model_name", ["vae", "hvae_2level",
                                        "convhvae_2level",
                                        "pixelhvae_2level"])
@pytest.mark.parametrize("prior", ["standard", "exemplar_prior"])
def test_fast_iwae_path_matches_generic(setup, prior, model_name):
    """Encode-once fast paths == generic per-round re-encode path: the
    x-only encoder work is row-independent and the reparam key discipline
    (incl. the 2-level (k2, k1) split) is identical, so per-point NLLs must
    agree to float tolerance."""
    cfg, m, params, x = setup
    cfg = cfg.replace(prior=prior, model_name=model_name, z2_size=8)
    m2 = create_model(cfg)
    k = jax.random.PRNGKey(0)
    v = m2.init(k, x, k)
    eb = None
    if prior == "exemplar_prior":
        bank = Bank(images=jnp.asarray(x),
                    data_idx=jnp.arange(32, dtype=jnp.int32),
                    valid=jnp.ones(32, bool), cache_means=None,
                    n_effective=32)
        eb = make_eval_bank_fn(m2, cfg)(v["params"], bank, k)
    key = jax.random.PRNGKey(11)
    fast = make_iwae_fn(m2, cfg)
    slow = make_iwae_fn(m2, cfg, force_generic=True)
    nll_f, per_f = fast(v["params"], np.asarray(x), key, eb, s_total=32, r=8)
    nll_s, per_s = slow(v["params"], np.asarray(x), key, eb, s_total=32, r=8)
    np.testing.assert_allclose(per_f, per_s, rtol=1e-5, atol=1e-5)


def test_eval_bank_no_loo_full_denominator(setup):
    """Exemplar eval bank: precomputed means, denominator N (not N-1)."""
    cfg, m, params, x = setup
    cfg = cfg.replace(prior="exemplar_prior")
    m2 = create_model(cfg)
    k = jax.random.PRNGKey(0)
    v = m2.init(k, x, k)
    bank = Bank(images=jnp.asarray(x), data_idx=jnp.arange(32, dtype=jnp.int32),
                valid=jnp.ones(32, bool), cache_means=None, n_effective=32)
    build = make_eval_bank_fn(m2, cfg)
    eb = build(v["params"], bank, k)
    assert eb.cache_means.shape == (32, cfg.z1_size)
    assert eb.images is None
    elbo = make_elbo_eval_fn(m2, cfg)
    loss, re, kl = elbo(v["params"], np.asarray(x), k, eb)
    assert np.isfinite(loss)
