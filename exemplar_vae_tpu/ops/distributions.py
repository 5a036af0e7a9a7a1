"""Log-density primitives.

Numerics contract (parity-critical, SURVEY.md §7.3 item 2):

* Gaussian log-densities follow the reference convention of OMITTING the
  ``-D/2 log(2*pi)`` constant (reference: utils/distributions.py::log_Normal_diag
  [U] — inherited from the vampprior codebase). The constant cancels in every
  quantity the system reports (KL terms and the IWAE estimate pair
  ``log p(z) - log q(z|x)`` are differences of equal-dimension Gaussians),
  so its omission is observable nowhere — but matching it keeps any
  intermediate logged value bit-comparable. Pass ``include_const=True`` for a
  true normalized density.
* Bernoulli probabilities are clamped to [1e-5, 1-1e-5]
  (reference: utils/distributions.py::log_Bernoulli [U]).
* ``log_logistic_256`` is the discretized-logistic CDF difference over 1/256
  bins with a 1e-7 floor (reference: utils/distributions.py::log_Logistic_256 [U]).

All functions are pure jnp, fp32-safe, and fuse under jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)
MIN_EPSILON = 1e-5
LOGISTIC_EPS = 1e-7


def _maybe_reduce(x, reduce_dim):
    if reduce_dim is None:
        return x
    return jnp.sum(x, axis=reduce_dim)


def log_normal_diag(x, mean, log_var, *, reduce_dim=-1, include_const=False):
    """Diagonal-Gaussian log density, element-wise then summed over reduce_dim."""
    lp = -0.5 * (log_var + jnp.square(x - mean) * jnp.exp(-log_var))
    if include_const:
        lp = lp - 0.5 * LOG_2PI
    return _maybe_reduce(lp, reduce_dim)


def log_normal_standard(x, *, reduce_dim=-1, include_const=False):
    """N(0, I) log density (same constant convention as log_normal_diag)."""
    lp = -0.5 * jnp.square(x)
    if include_const:
        lp = lp - 0.5 * LOG_2PI
    return _maybe_reduce(lp, reduce_dim)


def log_bernoulli(x, p, *, reduce_dim=-1):
    """Bernoulli log likelihood with clamped probabilities."""
    pc = jnp.clip(p, MIN_EPSILON, 1.0 - MIN_EPSILON)
    lp = x * jnp.log(pc) + (1.0 - x) * jnp.log(1.0 - pc)
    return _maybe_reduce(lp, reduce_dim)


def log_logistic_256(x, mean, log_var, *, reduce_dim=-1):
    """Discretized logistic likelihood over 256 gray levels.

    x is in [0, 1); each pixel's probability mass is the logistic CDF
    difference across its 1/256-wide bin (reference:
    utils/distributions.py::log_Logistic_256 [U]).
    """
    bin_size = 1.0 / 256.0
    scale = jnp.exp(log_var)
    # snap x down to its bin's left edge, standardize
    xs = (jnp.floor(x / bin_size) * bin_size - mean) / scale
    cdf_plus = jax.nn.sigmoid(xs + bin_size / scale)
    cdf_minus = jax.nn.sigmoid(xs)
    lp = jnp.log(cdf_plus - cdf_minus + LOGISTIC_EPS)
    return _maybe_reduce(lp, reduce_dim)


def pairwise_log_normal(z, means, log_var_scalar, *, include_const=False):
    """All-pairs diagonal-Gaussian log density with a SHARED scalar variance.

    This is the mathematical core of the exemplar prior (reference:
    utils/distributions.py::log_normal_diag_vectorized [U], specialized to the
    isotropic shared-sigma^2 case of the paper, arXiv:2004.04795 Eq. 4):

        out[b, n] = log N(z_b ; means_n, sigma^2 I)   (up to the 2pi constant)
                  = -D/2 * log_var - ||z_b - means_n||^2 / (2 sigma^2)

    The pairwise squared distance expands to
    ``||z||^2 + ||mu||^2 - 2 z @ mu^T`` — one (B,D)x(D,N) matmul, which is
    exactly the MXU-shaped formulation the Pallas kernel tiles
    (ops/pallas_lse.py). This jnp version is the numerics oracle.

    Args:
      z: (B, D) batch latents.
      means: (N, D) exemplar latent means.
      log_var_scalar: scalar log sigma^2 (learned).
    Returns:
      (B, N) log densities, fp32.
    """
    z = z.astype(jnp.float32)
    means = means.astype(jnp.float32)
    d = z.shape[-1]
    z_sq = jnp.sum(jnp.square(z), axis=-1, keepdims=True)          # (B, 1)
    m_sq = jnp.sum(jnp.square(means), axis=-1)[None, :]            # (1, N)
    cross = jax.lax.dot_general(
        z, means,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                              # (B, N)
    sq_dist = jnp.maximum(z_sq + m_sq - 2.0 * cross, 0.0)
    inv_var = jnp.exp(-log_var_scalar)
    lp = -0.5 * (d * log_var_scalar + sq_dist * inv_var)
    if include_const:
        lp = lp - 0.5 * d * LOG_2PI
    return lp
