"""Closed-form and oracle cross-checks for ops/distributions
(SURVEY.md §4: 'unit tests for distributions (closed-form cross-checks)')."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exemplar_vae_tpu.ops import distributions as D


def test_log_normal_diag_matches_closed_form(rng):
    x = jnp.asarray(rng.normal(size=(5, 7)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=(5, 7)), jnp.float32)
    log_var = jnp.asarray(rng.normal(size=(5, 7)), jnp.float32)
    got = D.log_normal_diag(x, mean, log_var, include_const=True)
    # scipy-free closed form
    var = np.exp(np.asarray(log_var))
    want = -0.5 * (np.log(2 * np.pi) + np.asarray(log_var)
                   + (np.asarray(x) - np.asarray(mean)) ** 2 / var)
    np.testing.assert_allclose(np.asarray(got), want.sum(-1), rtol=1e-5)


def test_reference_convention_omits_constant(rng):
    """Default (include_const=False) differs from the true density by
    exactly D/2 * log(2 pi) — the reference's convention."""
    x = jnp.asarray(rng.normal(size=(3, 4)), jnp.float32)
    a = D.log_normal_diag(x, x * 0, x * 0, include_const=False)
    b = D.log_normal_diag(x, x * 0, x * 0, include_const=True)
    np.testing.assert_allclose(np.asarray(a - b), 4 * 0.5 * math.log(2 * math.pi),
                               rtol=1e-6)


def test_log_normal_standard_is_zero_mean_unit_var(rng):
    x = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
    got = D.log_normal_standard(x)
    want = D.log_normal_diag(x, jnp.zeros_like(x), jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_log_bernoulli_clamps_probabilities():
    x = jnp.asarray([[1.0, 0.0]])
    p = jnp.asarray([[1.0, 0.0]])  # would be log(0) without clamping
    out = D.log_bernoulli(x, p)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out)[0],
                               2 * math.log(1 - 1e-5), rtol=5e-3)


def test_log_bernoulli_matches_torch_oracle(rng):
    torch = pytest.importorskip("torch")
    x = (rng.random((4, 9)) > 0.5).astype(np.float32)
    p = rng.uniform(0.01, 0.99, (4, 9)).astype(np.float32)
    got = D.log_bernoulli(jnp.asarray(x), jnp.asarray(p))
    tp = torch.tensor(p).clamp(1e-5, 1 - 1e-5)
    tx = torch.tensor(x)
    want = (tx * tp.log() + (1 - tx) * (1 - tp).log()).sum(-1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_log_logistic_256_sums_to_one_over_bins():
    """Total probability over all 256 bins must be (nearly) 1."""
    bins = jnp.arange(256, dtype=jnp.float32)[:, None] / 256.0
    mean = jnp.full_like(bins, 0.4)
    log_var = jnp.full_like(bins, -3.0)
    lp = D.log_logistic_256(bins, mean, log_var, reduce_dim=None)
    total = float(jnp.sum(jnp.exp(lp)))
    # CDF mass outside [0,1) plus the 1e-7 floor keep this just under/over 1
    assert 0.97 < total < 1.01


def test_log_logistic_256_bin_snapping():
    """Values inside the same 1/256 bin get identical likelihood."""
    m = jnp.asarray([[0.5]])
    lv = jnp.asarray([[-2.0]])
    a = D.log_logistic_256(jnp.asarray([[100.2 / 256]]), m, lv)
    b = D.log_logistic_256(jnp.asarray([[100.9 / 256]]), m, lv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pairwise_log_normal_matches_direct(rng):
    z = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(11, 8)), jnp.float32)
    lv = jnp.float32(-0.7)
    got = D.pairwise_log_normal(z, mu, lv)
    sq = ((np.asarray(z)[:, None] - np.asarray(mu)[None]) ** 2).sum(-1)
    want = -0.5 * (8 * float(lv) + sq * math.exp(0.7))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
