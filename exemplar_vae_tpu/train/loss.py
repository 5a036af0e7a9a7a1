"""ELBO / IWAE term assembly (reference: models/BaseModel.py::calculate_loss [U]).

Pure functions of (variables, batch, bank) so the whole train step jits and
shards. The objective (SURVEY.md §0.1):

    loss = -RE + beta * KL,   KL = E_q[log q(z|x) - log p(z|X)] (+ HVAE level-1)

Exemplar-prior support resolution, three modes (SURVEY.md §3.1):
  train+exact   — differentiably re-encode the WHOLE exemplar bank through
                  the current encoder (rematerialized, chunked; sharded over
                  the mesh via parallel/sharded_prior when a mesh is given)
  train+approx  — kNN over the stale cached means, gather + fresh re-encode
                  of each point's K neighbors (gradients flow), stale-cache
                  semantics per SURVEY.md §3.5
  eval          — precomputed full bank means, no LOO mask, denominator N
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.models.base import reconstruction_log_lik
from exemplar_vae_tpu.ops.distributions import log_normal_diag
from exemplar_vae_tpu.ops.knn import dedup_valid_mask, encode_bank, knn_indices
from exemplar_vae_tpu.ops.preprocess import preprocess_batch


def bank_pre_fn(cfg: Config, train: Optional[bool] = None):
    """Per-chunk preprocessing hook for RAW (uint8) banks — see
    encode_bank. Float banks are preprocessed once per epoch instead.

    ``train=None`` resolves to ``cfg.bank_stochastic_preprocess``: by
    default the bank uses DETERMINISTIC preprocessing everywhere — the
    reference encodes the loader-held dataset tensors for the exemplar
    embedding; only the training batch gets fresh stochastic draws [U]
    (see Config.bank_stochastic_preprocess)."""
    if train is None:
        train = cfg.bank_stochastic_preprocess

    def pre(key, xc):
        return preprocess_batch(key, xc, input_type=cfg.input_type,
                                dynamic_binarization=cfg.dynamic_binarization,
                                train=train)

    return pre


class Bank(NamedTuple):
    """Exemplar-bank inputs threaded through the step functions.

    images: preprocessed exemplar inputs (N, H, W, C) — None at eval.
    data_idx: (N,) int32 global dataset indices (LOO addressing).
    valid: (N,) bool — False rows are padding.
    cache_means: (N, Dz) — stale cache (approx mode) or precomputed exact
      means (eval); None in exact-train mode.
    n_effective: static int — true exemplar count N (mixture denominator).
    """
    images: Any
    data_idx: Any
    valid: Any
    cache_means: Any
    n_effective: int


def bank_log_denom(cfg: Config, bank: Bank, train: bool):
    """log(N) at eval; log(N-1) when the LOO mask removes one component.

    jnp math: ``bank.n_effective`` is a pytree leaf and may be traced."""
    n = jnp.asarray(bank.n_effective, jnp.float32)
    if train and cfg.loo_mask_enabled:
        return jnp.log(n - 1.0)
    return jnp.log(n)


def exemplar_prior_log_prob(model, variables, out, cfg: Config, bank: Bank,
                            data_idx, train: bool, sharded_exact_fn=None,
                            sharded_approx_fn=None, bank_key=None):
    """log p(z_top | exemplar bank) for the three support-resolution modes."""
    log_denom = bank_log_denom(cfg, bank, train)
    loo_idx = data_idx if (train and cfg.loo_mask_enabled) else None
    impl = "pallas" if cfg.use_pallas_prior else "scan"
    raw_bank = bank.images is not None and bank.images.dtype == jnp.uint8
    pre = bank_pre_fn(cfg) if raw_bank else None
    if bank_key is None:
        bank_key = jax.random.PRNGKey(0)

    if train and cfg.approximate_prior and sharded_approx_fn is not None:
        # sharded cache + bank (parallel/sharded_knn.py)
        return sharded_approx_fn(variables, out, bank, loo_idx, log_denom,
                                 bank_key)

    if train and cfg.approximate_prior:
        # kNN over the stale cache, fresh differentiable re-encode of K
        idx = knn_indices(out.q_mean, bank.cache_means, cfg.approximate_k,
                          valid=bank.valid)
        # gather from a flat 2D view: XLA re-lays-out a big NHWC array for
        # in-loop gathers (tiling the size-3 channel dim pads it 43x), which
        # both OOMs and grinds compilation at CelebA scale
        bank2d = bank.images.reshape(bank.images.shape[0], -1)
        sel = jnp.take(bank2d, idx.reshape(-1), axis=0)      # (B*K, HWC)
        flat = sel.reshape((-1,) + bank.images.shape[1:])
        if pre is not None:
            flat = pre(bank_key, flat)
        _enc = lambda v, f: model.apply(v, f, method="encode_top_mean")
        if cfg.approx_remat:
            _enc = jax.checkpoint(_enc)
        means = _enc(variables, flat)
        if cfg.approximate_support == "batch_union":
            # union over the batch (SURVEY.md §3.5 reading): every point's
            # mixture runs over all B*K selected exemplars, duplicates
            # masked so each unique exemplar counts once (Config docstring)
            flat_idx = idx.reshape(-1)
            # impl is deliberately "scan", not cfg.use_pallas_prior: the
            # union support is only B*K columns (~1e3), far below the
            # shape regime where the Pallas kernel wins (it pays off when
            # the (B, N) logits tile would spill — DESIGN.md §8b measured
            # crossover ~32k rows x 50k cols); at this size kernel dispatch
            # would only add overhead
            return model.apply(
                variables, out.z_top, bank_means=means, data_idx=loo_idx,
                exemplar_idx=jnp.take(bank.data_idx, flat_idx),
                valid=dedup_valid_mask(flat_idx), log_denom=log_denom,
                impl="scan", block_n=cfg.prior_block_n,
                method="log_p_z_top")
        means = means.reshape(idx.shape + (means.shape[-1],))
        ex_idx_bk = jnp.take(bank.data_idx, idx, axis=0)
        return model.apply(
            variables, out.z_top, bank_means=means, data_idx=loo_idx,
            exemplar_idx=ex_idx_bk, log_denom=log_denom,
            method="log_p_z_top")

    if train:
        # exact: differentiable full-bank re-encode
        if sharded_exact_fn is not None:
            return sharded_exact_fn(variables, out.z_top, loo_idx,
                                    bank, log_denom, bank_key)
        means = encode_bank(model, variables, bank.images,
                            chunk=cfg.exact_reencode_chunk,
                            remat=cfg.exact_remat,
                            pre_fn=pre, pre_key=bank_key)
        return model.apply(
            variables, out.z_top, bank_means=means, data_idx=loo_idx,
            exemplar_idx=bank.data_idx, valid=bank.valid,
            log_denom=log_denom, impl=impl, block_n=cfg.prior_block_n,
            method="log_p_z_top")

    # eval: precomputed exact means, no LOO
    return eval_log_p_top(model, variables, out.z_top, cfg, bank)


def eval_log_p_top(model, variables, z, cfg: Config, bank: Optional[Bank]):
    """log p(z_top) at EVAL: full precomputed bank, no LOO, denominator N
    (reference eval protocol, SURVEY.md §3.2). Shared by elbo_terms and the
    encode-once IWAE fast path (train/evaluation.py)."""
    if cfg.prior != "exemplar_prior":
        return model.apply(variables, z, method="log_p_z_top")
    impl = "pallas" if cfg.use_pallas_prior else "scan"
    return model.apply(
        variables, z, bank_means=bank.cache_means, data_idx=None,
        exemplar_idx=bank.data_idx, valid=bank.valid,
        log_denom=bank_log_denom(cfg, bank, False),
        impl=impl, block_n=cfg.prior_block_n, method="log_p_z_top")


def elbo_terms(model, variables, x, key, cfg: Config, *, data_idx=None,
               bank: Optional[Bank] = None, train: bool = True,
               sharded_exact_fn=None, sharded_approx_fn=None, bank_key=None):
    """One forward pass -> per-example (RE, KL).

    The IWAE importance weight is ``RE - KL`` with these sampled terms
    (reference: utils/evaluation.py::calculate_likelihood [U]).
    """
    out = model.apply(variables, x, key)
    re = reconstruction_log_lik(x, out.x_mean, out.x_logvar, cfg.input_type)
    log_q = log_normal_diag(out.z_top, out.q_mean, out.q_logvar)
    if cfg.prior == "exemplar_prior":
        log_p = exemplar_prior_log_prob(model, variables, out, cfg, bank,
                                        data_idx, train, sharded_exact_fn,
                                        sharded_approx_fn, bank_key)
    else:
        log_p = model.apply(variables, out.z_top, method="log_p_z_top")
    kl = log_q - log_p + out.extra_kl
    return re, kl, out


def batch_loss(model, variables, x, key, beta, cfg: Config, *, data_idx=None,
               bank=None, train=True, sharded_exact_fn=None,
               sharded_approx_fn=None, bank_key=None):
    """Scalar loss + aux metrics (reference: calculate_loss averaged [U])."""
    re, kl, _ = elbo_terms(model, variables, x, key, cfg, data_idx=data_idx,
                           bank=bank, train=train,
                           sharded_exact_fn=sharded_exact_fn,
                           sharded_approx_fn=sharded_approx_fn,
                           bank_key=bank_key)
    loss = jnp.mean(-re + beta * kl)
    return loss, {"re": jnp.mean(-re), "kl": jnp.mean(kl), "loss": loss}
