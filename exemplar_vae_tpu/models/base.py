"""Shared VAE machinery: prior dispatch, likelihood heads, ELBO/IWAE terms.

Replaces the reference's models/BaseModel.py [U] (calculate_loss, log_p_z,
reparameterize, generation APIs — SURVEY.md §2 C5/C6). Here the module only
*parameterizes* distributions; loss assembly is a pure function (train/loss.py)
so the whole step jits and shards cleanly.

Every model exposes the same method surface:
  __call__(x, key)           -> ForwardOut (sampled latents + all stats)
  encode_top(x)              -> (mean, logvar) of the prior-level latent
  encode_top_mean(x)         -> mean only (exemplar-bank caching)
  generate_from_top(z, key)  -> decoded x parameters (generation path)
  log_p_z_top(z, ...)        -> prior log-density dispatch {standard,
                                vampprior, exemplar_prior}
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.models.layers import hardtanh
from exemplar_vae_tpu.ops.distributions import (
    log_bernoulli,
    log_logistic_256,
    log_normal_diag,
    log_normal_standard,
)
from exemplar_vae_tpu.ops.exemplar_prior import exemplar_log_prob, NEG_INF


class ForwardOut(NamedTuple):
    """Everything one forward pass produces (per example)."""
    z_top: jnp.ndarray        # (B, Dz) sampled prior-level latent
    q_mean: jnp.ndarray       # (B, Dz)
    q_logvar: jnp.ndarray     # (B, Dz)
    x_mean: jnp.ndarray       # (B, ...) decoder mean / Bernoulli probs
    x_logvar: jnp.ndarray     # (B, ...) decoder log-var (zeros for binary)
    extra_kl: jnp.ndarray     # (B,) lower-level sampled KL (HVAE); zeros for VAE


def reparameterize(key, mean, logvar):
    """z = mean + sigma * eps (reference: BaseModel.reparameterize [U])."""
    eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return mean + jnp.exp(0.5 * logvar) * eps


def reconstruction_log_lik(x, x_mean, x_logvar, input_type: str):
    """log p(x | z) summed over pixels (SURVEY.md §0.2 likelihood heads)."""
    b = x.shape[0]
    xf = x.reshape(b, -1)
    mf = x_mean.reshape(b, -1)
    if input_type == "binary":
        return log_bernoulli(xf, mf)
    # gray / continuous -> discretized logistic over 256 bins
    lvf = x_logvar.reshape(b, -1)
    return log_logistic_256(xf, mf, lvf)


def likelihood_params(x_mean, logvar_fn, input_type: str):
    """Decoder likelihood-head clamps shared by EVERY family [U]:
    binary -> (sigmoid'd mean, zero log-var placeholder); gray/continuous
    -> mean clipped to [1/512, 1-1/512] (logistic-256 bin snapping) plus
    the hardtanh'd log-var head. ``x_mean`` arrives already sigmoid'd and
    fp32; ``logvar_fn`` evaluates the log-var head lazily (binary models
    don't declare one). One definition so a clamp change can't silently
    miss one of the five decode sites."""
    if input_type == "binary":
        return x_mean, jnp.zeros_like(x_mean)
    return (jnp.clip(x_mean, 1.0 / 512.0, 1.0 - 1.0 / 512.0),
            logvar_fn().astype(jnp.float32))


def prior_log_var_floor(cfg) -> float:
    """Lower clamp for the learned prior log-variance.

    Default -8.0 (a pure fp32-overflow guard that never binds in healthy
    training). ``cfg.prior_var_min > 0`` raises it to log(prior_var_min) —
    an opt-in curvature cap. Round-3 measurement (sigma_floor_demo.json):
    this floor alone does NOT stop the late-training divergence — with it
    binding at 0.05 the known-diverging run still NaN'd 2 epochs later;
    the measured driver is an encoder runaway after q_logvar saturates at
    its own -6 clamp (docs/DESIGN.md §4b, sigma_collapse_diag.json). The
    knob that targets that mechanism is cfg.q_logvar_min. With
    prior_var_min == 0 (default) the clamp is the round-2 constant and
    behavior is bit-identical."""
    if cfg is not None and getattr(cfg, "prior_var_min", 0.0) > 0.0:
        return max(-8.0, math.log(cfg.prior_var_min))
    return -8.0


def clamped_prior_log_var(params, cfg=None):
    """Module-free access to the clamped prior log-variance (same hardtanh
    as PriorMixin.get_prior_log_var) for code that works on raw param
    dicts (sharded paths, sampling, augmentation). Pass cfg to honor the
    opt-in cfg.prior_var_min floor."""
    return hardtanh(params["prior_log_var"], prior_log_var_floor(cfg), 8.0)


def rows_exemplar_log_prob(z, means_bk, log_var, *, log_denom,
                           data_idx=None, exemplar_idx_bk=None):
    """Exemplar prior over a PER-ROW support set (approximate-kNN mode).

    Each batch point b has its own K re-encoded neighbors
    (reference: BaseModel.get_exemplar_set / log_p_z_exemplar in approximate
    mode [U]; paper §3.2). LSE over K with the FULL-set denominator keeps the
    objective a lower bound on the exact mixture.

    Args:
      z: (B, D); means_bk: (B, K, D); exemplar_idx_bk: (B, K) global indices.
    """
    d = z.shape[-1]
    sq = jnp.sum(jnp.square(z[:, None, :] - means_bk), axis=-1)      # (B, K)
    lp = -0.5 * (d * log_var + sq * jnp.exp(-log_var))
    if data_idx is not None and exemplar_idx_bk is not None:
        lp = jnp.where(exemplar_idx_bk == data_idx[:, None], NEG_INF, lp)
    m = jnp.max(lp, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(lp - m[:, None]), axis=-1))
    return lse - jnp.asarray(log_denom, jnp.float32)


class PriorMixin:
    """Prior parameters + log p(z_top) dispatch, shared by all models.

    Dispatch mirrors reference models/BaseModel.py::log_p_z [U]:
      standard        -> N(0, I)
      vampprior       -> mixture over learned pseudo-inputs re-encoded by the
                         current encoder (per-component diagonal variances)
      exemplar_prior  -> isotropic mixture over exemplar latent means with a
                         learned shared scalar sigma^2 (paper Eq. 4)
    """

    def _setup_prior(self):
        cfg: Config = self.cfg
        if cfg.prior == "exemplar_prior":
            init = math.log(cfg.prior_variance_init)
            self.prior_log_var = self.param(
                "prior_log_var",
                lambda k: jnp.asarray(init, jnp.float32))
        elif cfg.prior == "vampprior":
            c_in, h, w = cfg.input_size
            self.pseudo_inputs = self.param(
                "pseudo_inputs", nn.initializers.normal(0.01),
                (cfg.number_components, h, w, c_in))

    def get_prior_log_var(self):
        """Learned shared log sigma^2, hardtanh-clamped to [-8, 8].

        Numerical guard, not a behavior change: in healthy training
        log_var sits in roughly [-3, 1] and the clamp never binds; it
        bounds exp(-log_var) away from fp32 overflow if sigma^2 ever runs
        away. Note the guard is NOT a divergence cure: a 50k-exemplar
        synthetic run still destabilized at log_var ~ -3.7 (well inside
        the clamp), and the round-3 diagnosis (docs/DESIGN.md §4b,
        sigma_collapse_diag.json) showed the shrinking sigma^2 is a
        SYMPTOM: the driver is the inference net's log-variance saturating
        at its -6 hardtanh (zero gradient) followed by an unbounded
        encoder-mean runaway under AdamNormGrad's constant-size steps.
        The trainer's non-finite abort + best-on-val selection contain
        the damage — and containment is the only mitigation that works:
        the 5-arm matrix in sigma_floor_demo.json measured every knob
        (sigma^2 floor, q_logvar floor, both, plain Adam) merely shifting
        the onset, never preventing it (DESIGN.md §4b)."""
        return hardtanh(self.prior_log_var, prior_log_var_floor(self.cfg), 8.0)

    def get_pseudo_inputs(self):
        """Pseudo-inputs clamped to valid pixel range (reference applies
        Hardtanh(0,1) to the learned pseudo-input layer [U])."""
        return hardtanh(self.pseudo_inputs, 0.0, 1.0)

    def log_p_z_top(self, z, *, bank_means=None, data_idx=None,
                    exemplar_idx=None, valid=None, log_denom=None,
                    impl="scan", block_n=2048):
        cfg: Config = self.cfg
        if cfg.prior == "standard":
            return log_normal_standard(z)
        if cfg.prior == "vampprior":
            u = self.get_pseudo_inputs()
            m, lv = self.encode_top(u)                       # (C, Dz) each
            lp = log_normal_diag(z[:, None, :], m[None], lv[None],
                                 reduce_dim=-1)              # (B, C)
            lse = jax.scipy.special.logsumexp(lp, axis=-1)
            return lse - math.log(cfg.number_components)
        # exemplar prior
        log_var = self.get_prior_log_var()
        if bank_means is None:
            raise ValueError("exemplar prior requires bank_means")
        if bank_means.ndim == 3:                             # approx: per-row K
            return rows_exemplar_log_prob(
                z, bank_means, log_var, log_denom=log_denom,
                data_idx=data_idx, exemplar_idx_bk=exemplar_idx)
        return exemplar_log_prob(
            z, bank_means, log_var, log_denom=log_denom, data_idx=data_idx,
            exemplar_idx=exemplar_idx, valid=valid, impl=impl,
            block_n=block_n)
