"""Validation ELBO + importance-weighted test NLL.

Reference: utils/evaluation.py::evaluate_loss / calculate_likelihood [U]
(SURVEY.md §3.2). Protocol preserved:

* test NLL = -[ logsumexp_s ( log p(x|z_s) + log p(z_s) - log q(z_s|x) )
               - log S ],  S importance samples per test point;
* at eval the exemplar prior uses the FULL bank (no kNN approximation) and
  NO leave-one-out mask; the bank means are encoded once and reused across
  every test point and sample (the reference re-uses its cache the same way);
* the reference chunks S for ONE test point at a time — here chunks are
  (T test points) x (R samples) per compiled call with an online-LSE carry
  over rounds, so the MXU always sees T*R-row batches.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.ops.knn import encode_bank
from exemplar_vae_tpu.ops.preprocess import preprocess_batch
from exemplar_vae_tpu.train.loss import Bank, elbo_terms


def make_eval_bank_fn(model, cfg: Config):
    """Encode the full exemplar bank once for evaluation (stop-gradient)."""

    @jax.jit
    def build(params, bank_images_raw, key):
        # cfg.exact_reencode_chunk is honored verbatim in BOTH branches
        # (0 = one giant unchunked encode), matching make_cache_refresh and
        # make_sharded_cache_refresh — the uint8 branch used to silently
        # override 0 with 8192, making the same config value mean different
        # things across the four bank-encode sites
        if bank_images_raw.dtype == jnp.uint8:
            from exemplar_vae_tpu.train.loss import bank_pre_fn
            means = encode_bank(
                model, {"params": params}, bank_images_raw,
                chunk=cfg.exact_reencode_chunk, remat=False,
                pre_fn=bank_pre_fn(cfg, train=False), pre_key=key)
            return jax.lax.stop_gradient(means)
        imgs = preprocess_batch(key, bank_images_raw,
                                input_type=cfg.input_type,
                                dynamic_binarization=cfg.dynamic_binarization,
                                train=False)
        means = encode_bank(model, {"params": params}, imgs,
                            chunk=cfg.exact_reencode_chunk, remat=False)
        return jax.lax.stop_gradient(means)

    def build_bank(params, bank: Bank, key) -> Bank:
        if cfg.prior != "exemplar_prior":
            return bank
        means = build(params, bank.images, key)
        return Bank(images=None, data_idx=bank.data_idx, valid=bank.valid,
                    cache_means=means, n_effective=bank.n_effective)

    return build_bank


def make_elbo_eval_fn(model, cfg: Config):
    """Mean validation loss/RE/KL (reference evaluate_loss [U]).

    All full batches run in ONE compiled lax.scan (one dispatch): a
    host-side batch loop costs ~100 tunnel round-trips per validation on
    a 10k val set, dwarfing the device time. Key discipline is identical
    to a host loop (fold_in(key, batch_index)), so results are bitwise
    unchanged; the tail batch (n % batch) runs as its own call with the
    next batch index, exactly as the loop would."""

    def _terms(params, x_raw, key, bank):
        k_bin, k_z = jax.random.split(key)
        x = preprocess_batch(k_bin, x_raw, input_type=cfg.input_type,
                             dynamic_binarization=cfg.dynamic_binarization,
                             train=False)
        re, kl, _ = elbo_terms(model, {"params": params}, x, k_z, cfg,
                               bank=bank, train=False)
        return jnp.stack([jnp.mean(-re + kl), jnp.mean(-re), jnp.mean(kl)])

    @jax.jit
    def eval_batch(params, x_raw, key, bank):
        return _terms(params, x_raw, key, bank)

    @functools.partial(jax.jit, static_argnames=("batch",))
    def eval_scan(params, x_all, key, bank, batch: int):
        steps = x_all.shape[0] // batch
        xb = x_all[:steps * batch].reshape((steps, batch) + x_all.shape[1:])

        def body(carry, inp):
            x_raw, i = inp
            return carry, _terms(params, x_raw, jax.random.fold_in(key, i),
                                 bank)

        _, outs = jax.lax.scan(body, None, (xb, jnp.arange(steps)))
        return outs                                    # (steps, 3)

    def evaluate(params, images_raw, key, bank, batch: Optional[int] = None):
        n = images_raw.shape[0]
        batch = min(batch or cfg.test_batch_size, n)
        steps = n // batch
        tot = np.zeros(3, np.float64)
        if steps:
            outs = np.asarray(eval_scan(params, jnp.asarray(images_raw),
                                        key, bank, batch), np.float64)
            tot += outs.sum(axis=0) * batch
        tail = n - steps * batch
        if tail:
            xb = images_raw[steps * batch:]
            out = eval_batch(params, xb, jax.random.fold_in(key, steps), bank)
            tot += np.asarray(out, np.float64) * tail
        return tuple(tot / max(n, 1))  # (loss, RE, KL)

    return evaluate


def make_iwae_fn(model, cfg: Config, force_generic: bool = False):
    """Importance-weighted NLL, S samples per point (reference
    calculate_likelihood [U]). force_generic disables the encode-once
    fast path (used by tests to pin the two paths against each other)."""

    # Encode-once fast paths: everything that depends only on x — q(z|x)
    # for the VAE; q(z2|x) AND the x-side (conv) features of q(z1|x,z2) for
    # the 2-level models — runs ONCE per chunk (t rows) instead of once per
    # round on t*r repeated rows. Per-round work shrinks to
    # sample -> (p_z1/q_z1 mixing) -> decode -> prior; for ConvHVAE both
    # encoder conv stacks leave the S-loop (~2.5x less model FLOPs/round).
    # Bitwise-identical to the generic path: repeated encoder rows are
    # row-independent GEMMs and the reparam draws use the same keys/shapes
    # (the __call__ key-split order is mirrored; tools/parity_trajectory.py
    # replays it).
    model_kind = cfg.model_name.lower()
    fast_single_level = model_kind == "vae" and not force_generic
    fast_two_level = (model_kind in ("hvae_2level", "convhvae_2level",
                                     "pixelhvae_2level")
                      and not force_generic)
    # PixelHVAE's likelihood is teacher-forced on x, so its decode takes
    # (x, z1, z2); the x-side encoder hoists out of the S-loop the same as
    # HVAE, only the decode call differs. Measured (v5e, S=256, N=10k):
    # perf-neutral (893 vs 879 pts/s) — the per-round masked-conv decode
    # dominates, unlike ConvHVAE where both encoder conv stacks hoist —
    # kept for uniformity (one code path per family) rather than speed.
    decode_needs_x = model_kind == "pixelhvae_2level"

    @functools.partial(jax.jit, static_argnames=("rounds", "r"))
    def chunk_nll(params, x_chunk_raw, key, bank, rounds: int, r: int):
        from exemplar_vae_tpu.models.base import (
            reconstruction_log_lik, reparameterize)
        from exemplar_vae_tpu.ops.distributions import log_normal_diag
        from exemplar_vae_tpu.train.loss import eval_log_p_top

        k_bin, k_s = jax.random.split(key)
        x = preprocess_batch(k_bin, x_chunk_raw, input_type=cfg.input_type,
                             dynamic_binarization=cfg.dynamic_binarization,
                             train=False)
        t = x.shape[0]
        x_rep = jnp.repeat(x, r, axis=0)
        if fast_single_level or fast_two_level:
            q_mean, q_logvar = model.apply({"params": params}, x,
                                           method="encode_top")
            mu_rep = jnp.repeat(q_mean, r, axis=0)
            lv_rep = jnp.repeat(q_logvar, r, axis=0)
        if fast_two_level:
            hx = model.apply({"params": params}, x, method="q_z1_cache")
            hx_rep = jnp.repeat(hx, r, axis=0)

        def body(carry, i):
            m, s = carry
            kz = jax.random.fold_in(k_s, i)
            if fast_single_level:
                z = reparameterize(kz, mu_rep, lv_rep)
                x_mean, x_logvar = model.apply({"params": params}, z,
                                               method="decode")
                re = reconstruction_log_lik(x_rep, x_mean, x_logvar,
                                            cfg.input_type)
                log_q = log_normal_diag(z, mu_rep, lv_rep)
                log_p = eval_log_p_top(model, {"params": params}, z, cfg, bank)
                a = (re - (log_q - log_p)).reshape(t, r)
            elif fast_two_level:
                # mirrors HVAE/ConvHVAE.__call__'s key-split order (k2, k1)
                k2, k1 = jax.random.split(kz)
                z2 = reparameterize(k2, mu_rep, lv_rep)
                q1_mean, q1_logvar = model.apply(
                    {"params": params}, hx_rep, z2, method="q_z1_from_cache")
                z1 = reparameterize(k1, q1_mean, q1_logvar)
                p1_mean, p1_logvar = model.apply({"params": params}, z2,
                                                 method="p_z1")
                extra_kl = (log_normal_diag(z1, q1_mean, q1_logvar)
                            - log_normal_diag(z1, p1_mean, p1_logvar))
                if decode_needs_x:
                    x_mean, x_logvar = model.apply(
                        {"params": params}, x_rep, z1, z2, method="decode")
                else:
                    x_mean, x_logvar = model.apply({"params": params}, z1, z2,
                                                   method="decode")
                re = reconstruction_log_lik(x_rep, x_mean, x_logvar,
                                            cfg.input_type)
                log_q = log_normal_diag(z2, mu_rep, lv_rep)
                log_p = eval_log_p_top(model, {"params": params}, z2, cfg,
                                       bank)
                a = (re - (log_q - log_p + extra_kl)).reshape(t, r)
            else:
                re, kl, _ = elbo_terms(model, {"params": params}, x_rep, kz,
                                       cfg, bank=bank, train=False)
                a = (re - kl).reshape(t, r)
            m_t = jnp.max(a, axis=1)
            m_new = jnp.maximum(m, m_t)
            s_new = s * jnp.exp(m - m_new) + jnp.sum(
                jnp.exp(a - m_new[:, None]), axis=1)
            return (m_new, s_new), None

        init = (jnp.full((t,), -1e30, jnp.float32), jnp.zeros((t,), jnp.float32))
        (m, s), _ = jax.lax.scan(body, init, jnp.arange(rounds))
        log_px = m + jnp.log(s) - math.log(rounds * r)
        return -log_px

    def calculate_likelihood(params, test_images_raw, key, bank,
                             s_total: Optional[int] = None,
                             chunk: Optional[int] = None,
                             r: Optional[int] = None):
        """Mean test NLL in nats/image. s_total ~ cfg.S, r ~ cfg.MB.

        When S is not divisible by the round size r, rounds are CEIL-divided
        so at least S samples are always used (rounds*r >= S; the estimator
        normalizes by rounds*r, so it stays consistent either way).

        chunk autotune: each compiled round materializes chunk*r input rows
        (x repeated per importance sample) plus activations, so the chunk is
        capped to keep that working set ~ a fixed HBM budget — at MNIST
        shapes the default test_batch_size stands, at CelebA (d_in 12288)
        the cap kicks in instead of OOMing."""
        s_total = s_total or cfg.S
        r = min(r or cfg.MB, s_total)
        rounds = max(-(-s_total // r), 1)
        if chunk is None:
            d_in = int(np.prod(test_images_raw.shape[1:]))
            rows_budget = max(4096, 268_435_456 // (d_in * 4))  # ~256MB fp32
            chunk = max(1, min(cfg.test_batch_size, rows_budget // r))
        n = test_images_raw.shape[0]
        nlls = []
        for i, start in enumerate(range(0, n, chunk)):
            xc = test_images_raw[start:start + chunk]
            out = chunk_nll(params, xc, jax.random.fold_in(key, i), bank,
                            rounds, r)
            nlls.append(np.asarray(out))
        return float(np.mean(np.concatenate(nlls))), np.concatenate(nlls)

    # the fixed-shape single-chunk kernel is the unit serve.py AOT-exports
    calculate_likelihood.chunk_nll = chunk_nll
    return calculate_likelihood
