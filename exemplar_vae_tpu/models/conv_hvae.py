"""Two-level convolutional hierarchical VAE
(reference: models/convHVAE_2level.py [U]).

Same factorization as HVAE (q(z2|x) q(z1|x,z2); p(z2) p(z1|z2) p(x|z1,z2))
with GatedConv2d encoder stacks and a GatedConvTranspose decoder, NHWC.

The conv stacks are CONFIG-DRIVEN (cfg.conv_enc_spec / cfg.conv_dec_spec /
cfg.conv_proj_channels, grammar in config.py::parse_conv_spec). The default
spec — enc GC(32,7x7,s1)->GC(32,3x3,s2)->GC(64,5x5,s1)->GC(64,3x3,s2),
dec dense->(H/4,W/4,64)->GCT(64,s2)->GCT(32,s2)->GC(32,3x3,s1)->1x1 heads —
follows the reference's ~32/64-channel 5x5/3x3 design (SURVEY.md §0.2 [M]:
exact channel counts are a rebuild assumption; externalizing them means the
session-0 correction against a populated reference mount is a config edit).

Requires H and W divisible by the encoder's total downsampling factor
(product of encoder strides), which must equal the decoder's total
upsampling factor (product of transpose-conv strides).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from exemplar_vae_tpu.config import Config, parse_conv_spec
from exemplar_vae_tpu.models.base import (ForwardOut, PriorMixin,
                                          likelihood_params,
                                          reparameterize)
from exemplar_vae_tpu.models.layers import (
    GatedConv2d,
    GatedConvTranspose2d,
    GatedDense,
    NonLinear,
    compute_dtype,
    p_logvar_activation,
    q_logvar_activation,
    q_logvar_activation_for,
)
from exemplar_vae_tpu.ops.distributions import log_normal_diag


def _build_stack(spec: str, dt):
    """Instantiate a conv stack from a parsed spec string."""
    layers = []
    for kind, feat, k, s in parse_conv_spec(spec):
        cls = GatedConvTranspose2d if kind == "t" else GatedConv2d
        layers.append(cls(feat, (k, k), (s, s), dtype=dt))
    return layers


def _net_scale(spec: str):
    """Net spatial scale of a stack as a Fraction: a stride-s conv divides
    H, W by s, a stride-s transpose conv multiplies by s (SAME padding).
    Counting BOTH layer kinds signed-ly (rather than only 'c' in encoders /
    only 't' in decoders) makes the setup assertion catch mixed specs like
    a strided 'c' layer inside a decoder, which would otherwise pass the
    check and fail later as a shape error in the loss."""
    from fractions import Fraction
    scale = Fraction(1)
    for kind, _, _, s in parse_conv_spec(spec):
        scale = scale * s if kind == "t" else Fraction(scale, s)
    return scale


class ConvHVAE(nn.Module, PriorMixin):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        h = cfg.hidden_size
        dt = compute_dtype(cfg)
        c_in, ih, iw = cfg.input_size
        enc_scale = _net_scale(cfg.conv_enc_spec)
        dec_scale = _net_scale(cfg.conv_dec_spec)
        assert enc_scale.numerator == 1, (
            f"encoder spec must be net-downsampling, got scale {enc_scale} "
            f"(conv_enc_spec={cfg.conv_enc_spec!r})")
        down = enc_scale.denominator
        assert dec_scale == down, (
            f"encoder downsampling x{down} != decoder net upsampling "
            f"x{dec_scale} (conv_enc_spec={cfg.conv_enc_spec!r}, "
            f"conv_dec_spec={cfg.conv_dec_spec!r})")
        assert ih % down == 0 and iw % down == 0, (
            f"ConvHVAE needs H, W divisible by {down}")
        self._dec_hw = (ih // down, iw // down)
        # q(z2 | x)
        self.q_z2_conv = _build_stack(cfg.conv_enc_spec, dt)
        self.q_z2_mean_head = nn.Dense(cfg.z2_size, dtype=dt)
        self.q_z2_logvar_head = NonLinear(cfg.z2_size, q_logvar_activation_for(cfg),
                                          dtype=dt)
        # q(z1 | x, z2)
        self.q_z1_conv = _build_stack(cfg.conv_enc_spec, dt)
        self.q_z1_z2 = GatedDense(h, dtype=dt)
        self.q_z1_joint = GatedDense(h, dtype=dt)
        self.q_z1_mean_head = nn.Dense(cfg.z1_size, dtype=dt)
        self.q_z1_logvar_head = NonLinear(cfg.z1_size, q_logvar_activation_for(cfg),
                                          dtype=dt)
        # p(z1 | z2)
        self.p_z1_layers = [GatedDense(h, dtype=dt), GatedDense(h, dtype=dt)]
        self.p_z1_mean_head = nn.Dense(cfg.z1_size, dtype=dt)
        self.p_z1_logvar_head = NonLinear(cfg.z1_size, q_logvar_activation,
                                          dtype=dt)
        # p(x | z1, z2)
        self.p_x_z1 = GatedDense(h, dtype=dt)
        self.p_x_z2 = GatedDense(h, dtype=dt)
        dh, dw = self._dec_hw
        self.p_x_project = nn.Dense(dh * dw * cfg.conv_proj_channels, dtype=dt)
        self.p_x_deconv = _build_stack(cfg.conv_dec_spec, dt)
        self.p_x_mean_head = nn.Conv(c_in, (1, 1), dtype=dt)
        if cfg.input_type != "binary":
            self.p_x_logvar_head = nn.Conv(c_in, (1, 1), dtype=dt)
        self._setup_prior()

    # --- inference net ---
    def encode_top(self, x):
        h = x
        for layer in self.q_z2_conv:
            h = layer(h)
        h = h.reshape(h.shape[0], -1)
        return (self.q_z2_mean_head(h).astype(jnp.float32),
                self.q_z2_logvar_head(h).astype(jnp.float32))

    def encode_top_mean(self, x):
        return self.encode_top(x)[0]

    def q_z1_cache(self, x):
        """x-only conv features of q(z1|x,z2) — computed once per test
        point in the encode-once IWAE fast path (train/evaluation.py); the
        whole q_z1 conv stack then stays out of the importance-sample loop."""
        h = x
        for layer in self.q_z1_conv:
            h = layer(h)
        return h.reshape(h.shape[0], -1)

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

    def decode(self, z1, z2):
        h1 = self.p_x_z1(z1)
        h2 = self.p_x_z2(z2)
        h = self.p_x_project(jnp.concatenate([h1, h2], axis=-1))
        dh, dw = self._dec_hw
        h = h.reshape(h.shape[0], dh, dw, self.cfg.conv_proj_channels)
        for layer in self.p_x_deconv:
            h = layer(h)
        return likelihood_params(
            jax.nn.sigmoid(self.p_x_mean_head(h)).astype(jnp.float32),
            lambda: p_logvar_activation(self.p_x_logvar_head(h)),
            self.cfg.input_type)

    def __call__(self, x, key):
        k2, k1 = jax.random.split(key)
        q2_mean, q2_logvar = self.encode_top(x)
        z2 = reparameterize(k2, q2_mean, q2_logvar)
        q1_mean, q1_logvar = self.q_z1(x, z2)
        z1 = reparameterize(k1, q1_mean, q1_logvar)
        p1_mean, p1_logvar = self.p_z1(z2)
        extra_kl = (log_normal_diag(z1, q1_mean, q1_logvar)
                    - log_normal_diag(z1, p1_mean, p1_logvar))
        x_mean, x_logvar = self.decode(z1, z2)
        return ForwardOut(z2, q2_mean, q2_logvar, x_mean, x_logvar, extra_kl)

    def generate_from_top(self, z2, key):
        p1_mean, p1_logvar = self.p_z1(z2)
        z1 = reparameterize(key, p1_mean, p1_logvar)
        return self.decode(z1, z2)[0]
