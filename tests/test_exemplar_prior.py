"""Exemplar-prior kernel: all impls vs a jnp.logaddexp oracle, LOO masking,
denominators, gradients (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exemplar_vae_tpu.ops.distributions import pairwise_log_normal
from exemplar_vae_tpu.ops.exemplar_prior import exemplar_log_prob, lse_combine
from exemplar_vae_tpu.models.base import rows_exemplar_log_prob

B, N, D = 6, 357, 40
IMPLS = ["naive", "scan", "pallas"]


@pytest.fixture(scope="module")
def problem():
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (B, D))
    mu = jax.random.normal(jax.random.PRNGKey(1), (N, D)) * 0.5
    lv = jnp.float32(-0.4)
    didx = (jnp.arange(B, dtype=jnp.int32) * 7) % N   # all present in bank
    eidx = jnp.arange(N, dtype=jnp.int32)
    return z, mu, lv, didx, eidx


def oracle(z, mu, lv, didx=None, eidx=None, log_denom=0.0):
    logits = pairwise_log_normal(z, mu, lv)
    if didx is not None:
        logits = jnp.where(didx[:, None] == eidx[None, :], -jnp.inf, logits)
    return jax.scipy.special.logsumexp(logits, axis=-1) - log_denom


@pytest.mark.parametrize("impl", IMPLS)
def test_matches_oracle_no_mask(problem, impl):
    z, mu, lv, _, eidx = problem
    want = oracle(z, mu, lv, log_denom=jnp.log(float(N)))
    got = exemplar_log_prob(z, mu, lv, log_denom=jnp.log(float(N)),
                            impl=impl, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_collapsed_prior_variance_stays_finite(problem):
    """sigma^2-collapse guard: with a runaway prior_log_var (observed drift
    to ~-40 on near-duplicate exemplars — AdamNormGrad gives the scalar a
    constant-size step, so nothing damps it), the clamped model density and
    its gradients must stay finite instead of overflowing exp(-log_var)."""
    import jax
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.models import create_model

    cfg = Config(model_name="vae", prior="exemplar_prior", hidden_size=16,
                 z1_size=8, use_pallas_prior=False)
    m = create_model(cfg)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (4, 28, 28, 1))
    v = m.init(k, x, k)
    params = dict(v["params"])
    params["prior_log_var"] = jnp.asarray(-40.0, jnp.float32)  # collapsed
    means = jax.random.normal(k, (32, 8))

    def f(params):
        return jnp.sum(m.apply({"params": params}, jnp.zeros((4, 8)),
                               bank_means=means, log_denom=jnp.log(32.0),
                               method="log_p_z_top"))

    val, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_pallas_bf16_matches_oracle_loosely(problem):
    """bf16-input kernel variant: same math, bf16 rounding of z/mu only
    (fp32 accumulation) — must track the fp32 oracle to bf16 tolerance."""
    z, mu, lv, _, eidx = problem
    want = oracle(z, mu, lv, log_denom=jnp.log(float(N)))
    got = exemplar_log_prob(z, mu, lv, log_denom=jnp.log(float(N)),
                            impl="pallas_bf16", block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("impl", IMPLS)
def test_loo_mask_removes_own_component(problem, impl):
    z, mu, lv, didx, eidx = problem
    want = oracle(z, mu, lv, didx, eidx, jnp.log(float(N - 1)))
    got = exemplar_log_prob(z, mu, lv, log_denom=jnp.log(float(N - 1)),
                            data_idx=didx, exemplar_idx=eidx, impl=impl,
                            block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # the mask must actually change the value when z sits ON its exemplar
    z_on = mu[np.asarray(didx)]
    masked = exemplar_log_prob(z_on, mu, lv, log_denom=0.0, data_idx=didx,
                               exemplar_idx=eidx, impl=impl, block_n=128)
    unmasked = exemplar_log_prob(z_on, mu, lv, log_denom=0.0, impl=impl,
                                 block_n=128)
    assert (np.asarray(unmasked) > np.asarray(masked) + 0.01).all()


@pytest.mark.parametrize("impl", IMPLS)
def test_padding_rows_are_ignored(problem, impl):
    z, mu, lv, _, eidx = problem
    pad = 73
    mu_p = jnp.concatenate([mu, jnp.full((pad, D), 5.0)], axis=0)
    eidx_p = jnp.concatenate([eidx, jnp.full((pad,), -2, jnp.int32)])
    valid = jnp.concatenate([jnp.ones(N, bool), jnp.zeros(pad, bool)])
    want = exemplar_log_prob(z, mu, lv, log_denom=0.0, impl="naive")
    got = exemplar_log_prob(z, mu_p, lv, log_denom=0.0, exemplar_idx=eidx_p,
                            valid=valid, impl=impl, block_n=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
def test_gradients_match_autodiff_oracle(problem, impl):
    z, mu, lv, didx, eidx = problem

    def f_ours(z, mu, lv):
        return jnp.sum(exemplar_log_prob(z, mu, lv, log_denom=0.0,
                                         data_idx=didx, exemplar_idx=eidx,
                                         impl=impl, block_n=128))

    def f_oracle(z, mu, lv):
        return jnp.sum(oracle(z, mu, lv, didx, eidx))

    go = jax.grad(f_oracle, argnums=(0, 1, 2))(z, mu, lv)
    gu = jax.grad(f_ours, argnums=(0, 1, 2))(z, mu, lv)
    for a, b in zip(gu, go):
        scale = np.maximum(np.max(np.abs(np.asarray(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=5e-3)


@pytest.mark.parametrize("impl", IMPLS)
def test_gradients_blockwise_path_matches_oracle(problem, impl, monkeypatch):
    """Force the blockwise backward (the above-WIDE_BWD_MAX_BYTES schedule)
    and pin it to the autodiff oracle — the default test shapes take the
    wide path (§8h-wide), so this keeps the big-footprint schedule covered."""
    import exemplar_vae_tpu.ops.exemplar_prior as ep
    z, mu, lv, didx, eidx = problem

    def f(z, mu, lv):
        return jnp.sum(exemplar_log_prob(z, mu, lv, log_denom=0.0,
                                         data_idx=didx, exemplar_idx=eidx,
                                         impl=impl, block_n=128))

    gu_wide = jax.grad(f, argnums=(0, 1, 2))(z, mu, lv)
    monkeypatch.setattr(ep, "WIDE_BWD_MAX_BYTES", 0)
    gu_block = jax.grad(f, argnums=(0, 1, 2))(z, mu, lv)
    go = jax.grad(lambda z, mu, lv: jnp.sum(oracle(z, mu, lv, didx, eidx)),
                  argnums=(0, 1, 2))(z, mu, lv)
    for a, b, c in zip(gu_wide, gu_block, go):
        scale = np.maximum(np.max(np.abs(np.asarray(c))), 1.0)
        # wide vs blockwise: same math, different reduction schedule
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(c) / scale, atol=5e-3)


def test_wide_bwd_fully_masked_rows_are_finite(monkeypatch):
    """A fully-masked row (all-padding bank shard) has lse = -inf; both
    backward schedules must return zero, finite grads for it."""
    import exemplar_vae_tpu.ops.exemplar_prior as ep
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    mu = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    valid = jnp.zeros((16,), bool)  # everything padding

    def f(z, mu, lv):
        return jnp.sum(exemplar_log_prob(z, mu, lv, log_denom=0.0,
                                         valid=valid, impl="scan", block_n=8))

    for max_bytes in (ep.WIDE_BWD_MAX_BYTES, 0):
        monkeypatch.setattr(ep, "WIDE_BWD_MAX_BYTES", max_bytes)
        grads = jax.grad(f, argnums=(0, 1, 2))(z, mu, jnp.float32(-0.3))
        for leaf in grads:
            assert np.isfinite(np.asarray(leaf)).all()


def test_lse_combine_is_logaddexp(rng):
    m1 = jnp.asarray(rng.normal(size=5), jnp.float32)
    s1 = jnp.asarray(rng.uniform(0.1, 2, 5), jnp.float32)
    m2 = jnp.asarray(rng.normal(size=5), jnp.float32)
    s2 = jnp.asarray(rng.uniform(0.1, 2, 5), jnp.float32)
    m, s = lse_combine(m1, s1, m2, s2)
    got = np.asarray(m + jnp.log(s))
    want = np.logaddexp(np.asarray(m1 + jnp.log(s1)),
                        np.asarray(m2 + jnp.log(s2)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rows_variant_matches_full_when_support_is_full(problem):
    """(B, K) per-row support with K=N rows == full-bank result."""
    z, mu, lv, didx, eidx = problem
    means_bk = jnp.broadcast_to(mu[None], (B, N, D))
    eidx_bk = jnp.broadcast_to(eidx[None], (B, N))
    got = rows_exemplar_log_prob(z, means_bk, lv, log_denom=jnp.log(float(N - 1)),
                                 data_idx=didx, exemplar_idx_bk=eidx_bk)
    want = oracle(z, mu, lv, didx, eidx, jnp.log(float(N - 1)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("impl", ["scan", "pallas"])
def test_ragged_sizes(impl):
    """Non-tile-multiple B and N exercise the padding paths."""
    for b, n in [(1, 1), (3, 5), (13, 129), (128, 2048 + 17)]:
        z = jax.random.normal(jax.random.PRNGKey(b), (b, 40))
        mu = jax.random.normal(jax.random.PRNGKey(n), (n, 40))
        lv = jnp.float32(0.3)
        want = exemplar_log_prob(z, mu, lv, log_denom=0.0, impl="naive")
        got = exemplar_log_prob(z, mu, lv, log_denom=0.0, impl=impl,
                                block_n=256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_dedup_valid_mask_marks_first_occurrences():
    from exemplar_vae_tpu.ops.knn import dedup_valid_mask
    idx = jnp.asarray([5, 3, 5, 7, 3, 3, 9], jnp.int32)
    got = np.asarray(jax.jit(dedup_valid_mask)(idx))
    # each VALUE is kept exactly once, and masked entries are duplicates
    vals = np.asarray(idx)
    assert sorted(vals[got].tolist()) == sorted(set(vals.tolist()))
    assert got.sum() == len(set(vals.tolist()))


def test_batch_union_support_equals_unique_union_oracle(problem):
    """Batch-union approximate support (Config.approximate_support =
    'batch_union', SURVEY.md §3.5): LSE over all B*K selected entries with
    duplicates masked == LSE over the unique union, for every batch point,
    with LOO still removing each point's own component."""
    from exemplar_vae_tpu.ops.knn import dedup_valid_mask
    z, mu, lv, didx, eidx = problem
    k = 11
    rng = np.random.default_rng(3)
    # overlapping per-row selections (duplicates across rows guaranteed)
    idx_bk = jnp.asarray(rng.integers(0, 40, (B, k)), jnp.int32)
    flat = idx_bk.reshape(-1)
    means_flat = mu[flat]
    log_denom = jnp.log(float(N - 1))
    got = exemplar_log_prob(
        z, means_flat, lv, log_denom=log_denom, data_idx=didx,
        exemplar_idx=eidx[flat], valid=dedup_valid_mask(flat), impl="scan",
        block_n=32)
    # numpy oracle over the unique union
    uniq = np.unique(np.asarray(flat))
    logits = np.asarray(pairwise_log_normal(z, mu[jnp.asarray(uniq)], lv))
    loo = np.asarray(didx)[:, None] == uniq[None, :]
    logits = np.where(loo, -np.inf, logits)
    m = logits.max(-1, keepdims=True)
    want = (m[:, 0] + np.log(np.exp(logits - m).sum(-1))
            - float(log_denom))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_batch_union_bound_is_tighter_than_per_row():
    """Each point's own top-K is a subset of the batch union, so the union
    LSE (duplicates masked) is >= the per-row LSE pointwise — batch_union
    is the tighter lower bound of the two approximate objectives."""
    from exemplar_vae_tpu.ops.knn import dedup_valid_mask, knn_indices
    k = jax.random.PRNGKey(2)
    z = jax.random.normal(k, (8, 12))
    cache = jax.random.normal(jax.random.PRNGKey(3), (64, 12))
    lv = jnp.float32(-0.2)
    K = 5
    idx = knn_indices(z, cache, K)                       # (8, K)
    means_bk = cache[idx]                                # fresh==cache here
    log_denom = jnp.log(64.0)
    per_row = rows_exemplar_log_prob(z, means_bk, lv, log_denom=log_denom)
    flat = idx.reshape(-1)
    union = exemplar_log_prob(
        z, cache[flat], lv, log_denom=log_denom,
        valid=dedup_valid_mask(flat), impl="scan", block_n=16)
    assert np.all(np.asarray(union) >= np.asarray(per_row) - 1e-5)


def test_batch_union_training_step_runs_and_lowers_loss():
    """Integration: a real approximate-mode train loss evaluates under both
    support modes; union KL <= per-row KL (same RE), and gradients flow."""
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.models import create_model
    from exemplar_vae_tpu.train.loss import Bank, batch_loss

    base = Config(model_name="vae", prior="exemplar_prior", hidden_size=16,
                  z1_size=8, approximate_prior=True, approximate_k=4,
                  number_components=32, use_pallas_prior=False,
                  dynamic_binarization=False)
    m = create_model(base)
    key = jax.random.PRNGKey(0)
    x = (jax.random.uniform(key, (6, 28, 28, 1)) > 0.5).astype(jnp.float32)
    bank_imgs = (jax.random.uniform(jax.random.PRNGKey(1), (32, 28, 28, 1))
                 > 0.5).astype(jnp.float32)
    v = m.init(key, x, key)
    cache = m.apply(v, bank_imgs, method="encode_top_mean")
    bank = Bank(images=bank_imgs, data_idx=jnp.arange(32, dtype=jnp.int32),
                valid=jnp.ones(32, bool), cache_means=cache, n_effective=32)
    didx = jnp.arange(6, dtype=jnp.int32)
    losses = {}
    for mode in ("per_row", "batch_union"):
        cfg = base.replace(approximate_support=mode)
        (loss, aux), grads = jax.value_and_grad(
            lambda p: batch_loss(m, {"params": p}, x, key, 1.0, cfg,
                                 data_idx=didx, bank=bank, train=True),
            has_aux=True)(v["params"])
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree.leaves(grads))
        losses[mode] = (float(loss), float(aux["kl"]))
    assert losses["batch_union"][1] <= losses["per_row"][1] + 1e-4


def test_prior_var_min_floor_binds_and_default_is_identity():
    """Opt-in sigma^2 floor (Config.prior_var_min, DESIGN.md §4b): with the
    default (0.0) the clamp is the round-2 [-8, 8] overflow guard —
    bit-identical behavior; with a floor set, get_prior_log_var can never
    go below log(prior_var_min), capping the prior's 1/sigma^2 curvature."""
    import math
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.models import create_model
    from exemplar_vae_tpu.models.base import (clamped_prior_log_var,
                                              prior_log_var_floor)

    cfg0 = Config(model_name="vae", prior="exemplar_prior", hidden_size=16,
                  z1_size=8)
    cfg_f = cfg0.replace(prior_var_min=0.05)
    assert prior_log_var_floor(cfg0) == -8.0
    assert prior_log_var_floor(None) == -8.0
    assert abs(prior_log_var_floor(cfg_f) - math.log(0.05)) < 1e-12

    m0, mf = create_model(cfg0), create_model(cfg_f)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (2, 28, 28, 1))
    v = m0.init(k, x, k)
    collapsed = dict(v["params"])
    collapsed["prior_log_var"] = jnp.float32(-5.0)  # deep in collapse
    # default: passes through (clamp at -8 does not bind)
    assert float(clamped_prior_log_var(collapsed, cfg0)) == -5.0
    assert float(m0.apply({"params": collapsed},
                          method="get_prior_log_var")) == -5.0
    # floored: binds at log(0.05) ~ -3.0
    want = math.log(0.05)
    assert abs(float(clamped_prior_log_var(collapsed, cfg_f)) - want) < 1e-6
    assert abs(float(mf.apply({"params": collapsed},
                              method="get_prior_log_var")) - want) < 1e-6
    # healthy value: both identical (floor does not bind above it)
    healthy = dict(collapsed, prior_log_var=jnp.float32(-1.0))
    assert float(clamped_prior_log_var(healthy, cfg_f)) == -1.0


def test_block_n_validated():
    """Invalid tile sizes fail with a clear ValueError, not a
    ZeroDivisionError in _round_up or an obscure Mosaic lowering crash."""
    import pytest as _pytest
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.ops.pallas_lse import pairwise_lse_pallas

    with _pytest.raises(ValueError, match="prior_block_n"):
        Config(prior_block_n=0)
    z = jnp.zeros((4, 8), jnp.float32)
    mu = jnp.zeros((16, 8), jnp.float32)
    eidx = jnp.arange(16, dtype=jnp.int32)
    valid = jnp.ones((16,), bool)
    with _pytest.raises(ValueError, match="positive"):
        pairwise_lse_pallas(z, mu, jnp.float32(0.0), None, eidx, valid,
                            block_n=0)
    # the %128 Mosaic constraint is enforced for real-TPU lowering only
    # (interpret mode pads freely); assert the guard exists
    with _pytest.raises(ValueError, match="multiple of 128"):
        pairwise_lse_pallas(z, mu, jnp.float32(0.0), None, eidx, valid,
                            block_n=64, interpret=False)
