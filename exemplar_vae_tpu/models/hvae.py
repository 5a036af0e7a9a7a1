"""Two-level hierarchical MLP VAE (reference: models/HVAE_2level.py [U]).

Factorization (SURVEY.md §0.2):
  inference   q(z2 | x) q(z1 | x, z2)
  generative  p(z2) p(z1 | z2) p(x | z1, z2)
The exemplar/vamp/standard prior sits on z2 (the top latent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.models.base import (ForwardOut, PriorMixin,
                                          likelihood_params,
                                          reparameterize)
from exemplar_vae_tpu.models.layers import (
    GatedDense,
    NonLinear,
    compute_dtype,
    p_logvar_activation,
    q_logvar_activation,
    q_logvar_activation_for,
)
from exemplar_vae_tpu.ops.distributions import log_normal_diag


class TwoLevelMLPCore:
    """Shared MLP inference net + p(z1|z2) of the two-level families —
    HVAE and PixelHVAE use the SAME encoder/q(z1)/p(z1) structure
    (reference: PixelHVAE_2level reuses the HVAE encoder [U]). Methods
    operate on submodules declared by `_setup_two_level_mlp` from the
    concrete class's setup; attribute names are the param-tree contract
    (torch twins and checkpoints key on them)."""

    def _setup_two_level_mlp(self):
        cfg = self.cfg
        h = cfg.hidden_size
        dt = compute_dtype(cfg)
        # q(z2 | x)
        self.q_z2_layers = [GatedDense(h, dtype=dt), GatedDense(h, dtype=dt)]
        self.q_z2_mean_head = nn.Dense(cfg.z2_size, dtype=dt)
        self.q_z2_logvar_head = NonLinear(cfg.z2_size,
                                          q_logvar_activation_for(cfg),
                                          dtype=dt)
        # q(z1 | x, z2)
        self.q_z1_x = GatedDense(h, dtype=dt)
        self.q_z1_z2 = GatedDense(h, dtype=dt)
        self.q_z1_joint = GatedDense(h, dtype=dt)
        self.q_z1_mean_head = nn.Dense(cfg.z1_size, dtype=dt)
        self.q_z1_logvar_head = NonLinear(cfg.z1_size,
                                          q_logvar_activation_for(cfg),
                                          dtype=dt)
        # p(z1 | z2)
        self.p_z1_layers = [GatedDense(h, dtype=dt), GatedDense(h, dtype=dt)]
        self.p_z1_mean_head = nn.Dense(cfg.z1_size, dtype=dt)
        self.p_z1_logvar_head = NonLinear(cfg.z1_size, q_logvar_activation,
                                          dtype=dt)

    # --- inference net ---
    def encode_top(self, x):
        h = x.reshape(x.shape[0], -1)
        for layer in self.q_z2_layers:
            h = layer(h)
        return (self.q_z2_mean_head(h).astype(jnp.float32),
                self.q_z2_logvar_head(h).astype(jnp.float32))

    def encode_top_mean(self, x):
        return self.encode_top(x)[0]

    def q_z1_cache(self, x):
        """x-only half of q(z1|x,z2) — computable once per test point and
        reused across importance samples (encode-once IWAE fast path,
        train/evaluation.py)."""
        return self.q_z1_x(x.reshape(x.shape[0], -1))

    def q_z1_from_cache(self, hx, z2):
        hz = self.q_z1_z2(z2)
        h = self.q_z1_joint(jnp.concatenate([hx.astype(hz.dtype), hz],
                                            axis=-1))
        return (self.q_z1_mean_head(h).astype(jnp.float32),
                self.q_z1_logvar_head(h).astype(jnp.float32))

    def q_z1(self, x, z2):
        return self.q_z1_from_cache(self.q_z1_cache(x), z2)

    # --- generative net ---
    def p_z1(self, z2):
        h = z2
        for layer in self.p_z1_layers:
            h = layer(h)
        return (self.p_z1_mean_head(h).astype(jnp.float32),
                self.p_z1_logvar_head(h).astype(jnp.float32))


class HVAE(nn.Module, TwoLevelMLPCore, PriorMixin):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        h = cfg.hidden_size
        dt = compute_dtype(cfg)
        self._setup_two_level_mlp()
        # p(x | z1, z2)
        self.p_x_z1 = GatedDense(h, dtype=dt)
        self.p_x_z2 = GatedDense(h, dtype=dt)
        self.p_x_joint = GatedDense(h, dtype=dt)
        self.p_x_mean_head = NonLinear(cfg.input_dim, jax.nn.sigmoid, dtype=dt)
        if cfg.input_type != "binary":
            self.p_x_logvar_head = NonLinear(cfg.input_dim,
                                             p_logvar_activation, dtype=dt)
        self._setup_prior()

    def decode(self, z1, z2):
        h1 = self.p_x_z1(z1)
        h2 = self.p_x_z2(z2)
        h = self.p_x_joint(jnp.concatenate([h1, h2], axis=-1))
        x_mean, x_logvar = likelihood_params(
            self.p_x_mean_head(h).astype(jnp.float32),
            lambda: self.p_x_logvar_head(h), self.cfg.input_type)
        shape = (z1.shape[0],) + tuple(self.cfg.input_size[1:]) + (self.cfg.input_size[0],)
        return x_mean.reshape(shape), x_logvar.reshape(shape)

    def __call__(self, x, key):
        k2, k1 = jax.random.split(key)
        q2_mean, q2_logvar = self.encode_top(x)
        z2 = reparameterize(k2, q2_mean, q2_logvar)
        q1_mean, q1_logvar = self.q_z1(x, z2)
        z1 = reparameterize(k1, q1_mean, q1_logvar)
        p1_mean, p1_logvar = self.p_z1(z2)
        # sampled lower-level KL: E_q[log q(z1|x,z2) - log p(z1|z2)]
        extra_kl = (log_normal_diag(z1, q1_mean, q1_logvar)
                    - log_normal_diag(z1, p1_mean, p1_logvar))
        x_mean, x_logvar = self.decode(z1, z2)
        return ForwardOut(z2, q2_mean, q2_logvar, x_mean, x_logvar, extra_kl)

    def generate_from_top(self, z2, key):
        p1_mean, p1_logvar = self.p_z1(z2)
        z1 = reparameterize(key, p1_mean, p1_logvar)
        return self.decode(z1, z2)[0]
