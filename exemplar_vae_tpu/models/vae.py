"""Single-stochastic-layer MLP VAE (reference: models/VAE.py::VAE [U]).

Encoder: flatten -> GatedDense(h) x2 -> (mu_z, logvar_z), z in R^{z1_size}.
Decoder: GatedDense(h) x2 -> likelihood head(s).
Log-variance heads hardtanh-clamped per the reference (SURVEY.md §0.2).
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
    q_logvar_activation_for,
)


class VAE(nn.Module, PriorMixin):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        h = cfg.hidden_size
        dt = compute_dtype(cfg)
        self.q_layers = [GatedDense(h, dtype=dt), GatedDense(h, dtype=dt)]
        self.q_mean_head = nn.Dense(cfg.z1_size, dtype=dt)
        self.q_logvar_head = NonLinear(cfg.z1_size, q_logvar_activation_for(cfg), dtype=dt)
        self.p_layers = [GatedDense(h, dtype=dt), GatedDense(h, dtype=dt)]
        self.p_mean_head = NonLinear(cfg.input_dim, jax.nn.sigmoid, dtype=dt)
        if cfg.input_type != "binary":
            self.p_logvar_head = NonLinear(cfg.input_dim, p_logvar_activation,
                                           dtype=dt)
        self._setup_prior()

    # --- inference net ---
    def encode_top(self, x):
        h = x.reshape(x.shape[0], -1)
        for layer in self.q_layers:
            h = layer(h)
        # distribution parameters are always fp32 (loss-math contract)
        return (self.q_mean_head(h).astype(jnp.float32),
                self.q_logvar_head(h).astype(jnp.float32))

    def encode_top_mean(self, x):
        return self.encode_top(x)[0]

    # --- generative net ---
    def decode(self, z):
        h = z
        for layer in self.p_layers:
            h = layer(h)
        x_mean, x_logvar = likelihood_params(
            self.p_mean_head(h).astype(jnp.float32),
            lambda: self.p_logvar_head(h), self.cfg.input_type)
        shape = (z.shape[0],) + tuple(self.cfg.input_size[1:]) + (self.cfg.input_size[0],)
        return x_mean.reshape(shape), x_logvar.reshape(shape)

    def __call__(self, x, key):
        q_mean, q_logvar = self.encode_top(x)
        z = reparameterize(key, q_mean, q_logvar)
        x_mean, x_logvar = self.decode(z)
        return ForwardOut(z, q_mean, q_logvar, x_mean, x_logvar,
                          jnp.zeros(x.shape[0], jnp.float32))

    def generate_from_top(self, z, key):
        return self.decode(z)[0]
