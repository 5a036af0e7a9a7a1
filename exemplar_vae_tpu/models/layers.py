"""NN primitives (reference: utils/nn.py::GatedDense/GatedConv2d/NonLinear/he_init [U]).

flax.linen modules, NHWC layout (TPU-native conv layout), He-normal init to
match the reference's ``he_init``. ``hardtanh`` clamps mirror the reference's
log-variance heads: q(z) log-var in [-6, 2]; continuous-likelihood decoder
log-var in [-4.5, 0] (SURVEY.md §0.2).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

he_init = nn.initializers.he_normal()

# compute dtype contract: params are always fp32; `dtype` only sets the
# matmul/conv compute precision (bfloat16 doubles MXU throughput). Loss
# math and distribution heads are cast back to fp32 by the models.


def hardtanh(x, min_val: float = -1.0, max_val: float = 1.0):
    return jnp.clip(x, min_val, max_val)


class NonLinear(nn.Module):
    """Linear layer with an optional activation (reference: utils/nn.py::NonLinear [U])."""
    features: int
    activation: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.features, kernel_init=he_init, dtype=self.dtype)(x)
        if self.activation is not None:
            h = self.activation(h)
        return h


class GatedDense(nn.Module):
    """h = f(W1 x) * sigmoid(W2 x) (reference: utils/nn.py::GatedDense [U]).

    PARAMETERS are kept as two separate (kernel, bias) pairs — matching the
    reference's two nn.Linear modules — because AdamNormGrad normalizes
    gradients PER TENSOR: a fused 2x-width kernel would L2-normalize the
    value and gate gradients jointly, boosting/shrinking each half
    differently from the reference whenever their norms differ (gate grads
    shrink through the sigmoid), i.e. a different training trajectory.
    COMPUTE still concatenates the kernels into one 2x-width GEMM so the
    MXU sees a single large matmul; the concat is fused by XLA and is noise
    next to the GEMM itself.
    """
    features: int
    activation: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        wh = self.param("h_kernel", he_init, (d_in, self.features))
        wg = self.param("g_kernel", he_init, (d_in, self.features))
        bh = self.param("h_bias", nn.initializers.zeros, (self.features,))
        bg = self.param("g_bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or wh.dtype
        # cast BEFORE concat: halves the HBM traffic of the per-step fuse
        # when dt is bf16 (params stay fp32 leaves)
        w = jnp.concatenate([wh.astype(dt), wg.astype(dt)], axis=-1)
        b = jnp.concatenate([bh.astype(dt), bg.astype(dt)])
        hg = x.astype(dt) @ w + b
        h, g = jnp.split(hg, 2, axis=-1)
        if self.activation is not None:
            h = self.activation(h)
        return h * jax.nn.sigmoid(g)


class GatedConv2d(nn.Module):
    """Gated convolution, NHWC (reference: utils/nn.py::GatedConv2d [U]).

    Separate value/gate kernels (reference granularity for AdamNormGrad's
    per-tensor normalization — see GatedDense), channel-concatenated into
    ONE conv so the MXU runs a single 2x-channel convolution.
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    activation: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        c_in = x.shape[-1]
        wh = self.param("h_kernel", he_init, (kh, kw, c_in, self.features))
        wg = self.param("g_kernel", he_init, (kh, kw, c_in, self.features))
        bh = self.param("h_bias", nn.initializers.zeros, (self.features,))
        bg = self.param("g_bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or wh.dtype
        w = jnp.concatenate([wh.astype(dt), wg.astype(dt)], axis=-1)
        b = jnp.concatenate([bh.astype(dt), bg.astype(dt)])
        hg = jax.lax.conv_general_dilated(
            x.astype(dt), w, window_strides=self.strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        h, g = jnp.split(hg, 2, axis=-1)
        if self.activation is not None:
            h = self.activation(h)
        return h * jax.nn.sigmoid(g)


class GatedConvTranspose2d(nn.Module):
    """Gated transposed convolution for decoders, NHWC (same separate
    value/gate parameterization as GatedConv2d, single fused conv)."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (2, 2)
    activation: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        c_in = x.shape[-1]
        wh = self.param("h_kernel", he_init, (kh, kw, c_in, self.features))
        wg = self.param("g_kernel", he_init, (kh, kw, c_in, self.features))
        bh = self.param("h_bias", nn.initializers.zeros, (self.features,))
        bg = self.param("g_bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or wh.dtype
        w = jnp.concatenate([wh.astype(dt), wg.astype(dt)], axis=-1)
        b = jnp.concatenate([bh.astype(dt), bg.astype(dt)])
        hg = jax.lax.conv_transpose(
            x.astype(dt), w, strides=self.strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        h, g = jnp.split(hg, 2, axis=-1)
        if self.activation is not None:
            h = self.activation(h)
        return h * jax.nn.sigmoid(g)


class MaskedConv2d(nn.Module):
    """PixelCNN masked convolution, NHWC (reference lineage:
    utils/nn.py::MaskedConv2d of the upstream vampprior codebase [U]).

    mask_type 'A' blocks the center pixel (first decoder layer — the
    prediction for pixel i must not see x_i); 'B' allows it (subsequent
    layers see features already causal in x). Masking is spatial: all
    input channels of a pixel are treated jointly (the standard
    single-group simplification; per-channel-group masks only matter for
    strictly autoregressive RGB likelihoods, which the reference family
    does not use).
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    mask_type: str = "B"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param("kernel", he_init, (kh, kw, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mask = jnp.ones((kh, kw, 1, 1), kernel.dtype)
        ch, cw = kh // 2, kw // 2
        mask = mask.at[ch, cw + (1 if self.mask_type == "B" else 0):].set(0.0)
        mask = mask.at[ch + 1:].set(0.0)
        dt = self.dtype or kernel.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), (kernel * mask).astype(dt),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dt)


def compute_dtype(cfg) -> Any:
    """cfg.compute_dtype -> flax layer dtype (None = fp32 everywhere)."""
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def q_logvar_activation(x):
    """Clamp for inference-net log-variances (reference hardtanh [-6, 2])."""
    return hardtanh(x, -6.0, 2.0)


def q_logvar_activation_for(cfg):
    """Inference-net log-var clamp honoring the opt-in cfg.q_logvar_min
    floor (default -6.0 == the reference hardtanh, bit-identical). The
    raised floor is the measured mitigation for the encoder-runaway
    divergence (docs/DESIGN.md §4b): hardtanh saturation at -6 zeroes the
    logvar head's gradient and the near-deterministic posterior lets
    AdamNormGrad integrate a directionally-consistent mean runaway."""
    lo = float(getattr(cfg, "q_logvar_min", -6.0))
    return lambda x: hardtanh(x, lo, 2.0)


def p_logvar_activation(x):
    """Clamp for continuous-decoder log-variances (reference hardtanh [-4.5, 0])."""
    return hardtanh(x, -4.5, 0.0)
