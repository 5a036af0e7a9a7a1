"""Exemplar prior: log p(z | X) = logsumexp_n log N(z; mu_n, sigma^2 I) - log(den).

This is the hot loop of the whole system (reference:
models/BaseModel.py::log_p_z branch 'exemplar_prior' +
utils/distributions.py::log_normal_diag_vectorized [U]; SURVEY.md §0.1, §3.1).

TPU-native design
-----------------
The pairwise term expands to ``||z||^2 + ||mu||^2 - 2 z @ mu^T`` — a single
(B,D)x(D,N) matmul that maps straight onto the MXU, followed by a logsumexp
over the exemplar axis. Three implementations share one API:

* ``impl='naive'``  — materialize the full (B, N) matrix (oracle; small N).
* ``impl='scan'``   — lax.scan over N-tiles with a flash-attention-style
                      online (running-max, running-sumexp) accumulator; never
                      materializes (B, N).
* ``impl='pallas'`` — ops/pallas_lse.py: the same online-LSE tiling as a fused
                      Pallas TPU kernel.

All are wrapped in ONE ``jax.custom_vjp`` so autodiff never stores the (B, N)
intermediate across the forward: the backward recomputes the softmax weights
from the saved row-LSE, either in one wide shot (3 large GEMMs, default at
train-sized (B, N) footprints — DESIGN.md §8h-wide) or blockwise
(O(B*D + N*D) memory) above WIDE_BWD_MAX_BYTES.

Leave-one-out masking (SURVEY.md §0.1): when training point b is itself in
the exemplar set, its own component is removed by comparing global data
indices; the caller passes ``log_denom = log(N-1)`` in that case (N at eval).

Cross-device: parallel/sharded_prior.py shards the bank over the mesh and
combines per-shard (m, s) pairs with psum in log space.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite sentinel: keeps running-max arithmetic NaN-free

# §8h roofline (ROOFLINE.json; DESIGN.md §8h): at train shapes the blockwise
# backward serializes N/block_n tiny (B, block_n) GEMM tiles at ~2% of MXU
# peak — 23% of the flagship step — while the full (B, N) weight matrix is
# only B*N*4 bytes (20 MB at B=100, N=50k). Below this budget the backward
# instead recomputes the logits in ONE (B,D)x(D,N) GEMM and runs two wide
# (B,N)-operand GEMMs (same math, same masks, MXU-shaped). Above it (huge
# B*N products, e.g. eval-shaped differentiation) the memory-safe blockwise
# scan is kept. Tests force each path by monkeypatching this constant.
WIDE_BWD_MAX_BYTES = 256 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _logits_tile(z, mu_tile, log_var, d):
    """(B, TN) pairwise log-density tile; fp32 on the MXU."""
    z_sq = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
    m_sq = jnp.sum(jnp.square(mu_tile), axis=-1)[None, :]
    cross = jax.lax.dot_general(
        z, mu_tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sq = jnp.maximum(z_sq + m_sq - 2.0 * cross, 0.0)
    return -0.5 * (d * log_var + sq * jnp.exp(-log_var))


def _mask_tile(logits, data_idx, ex_idx_tile, valid_tile):
    """Apply LOO + padding masks to a logits tile."""
    masked = ~valid_tile[None, :]
    if data_idx is not None:
        masked = masked | (data_idx[:, None] == ex_idx_tile[None, :])
    return jnp.where(masked, NEG_INF, logits)


# ---------------------------------------------------------------------------
# forward implementations
# ---------------------------------------------------------------------------

def _lse_naive(z, means, log_var, data_idx, ex_idx, valid):
    d = z.shape[-1]
    logits = _logits_tile(z, means, log_var, d)
    logits = _mask_tile(logits, data_idx, ex_idx, valid)
    m = jnp.max(logits, axis=-1)
    s = jnp.sum(jnp.exp(logits - m[:, None]), axis=-1)
    return m + jnp.log(s)


def _lse_scan(z, means, log_var, data_idx, ex_idx, valid, block_n):
    b, d = z.shape
    n = means.shape[0]
    n_pad = _round_up(max(n, block_n), block_n)
    pad = n_pad - n
    means_p = jnp.pad(means, ((0, pad), (0, 0)))
    ex_idx_p = jnp.pad(ex_idx, (0, pad), constant_values=-1)
    valid_p = jnp.pad(valid, (0, pad), constant_values=False)
    num_tiles = n_pad // block_n

    means_t = means_p.reshape(num_tiles, block_n, d)
    ex_t = ex_idx_p.reshape(num_tiles, block_n)
    valid_t = valid_p.reshape(num_tiles, block_n)

    def body(carry, tile):
        m_run, s_run = carry
        mu_tile, ex_tile, v_tile = tile
        logits = _mask_tile(_logits_tile(z, mu_tile, log_var, d),
                            data_idx, ex_tile, v_tile)
        m_tile = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m_run, m_tile)
        s_new = s_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1)
        return (m_new, s_new), None

    init = (jnp.full((b,), NEG_INF, jnp.float32), jnp.zeros((b,), jnp.float32))
    (m, s), _ = jax.lax.scan(body, init, (means_t, ex_t, valid_t))
    return m + jnp.log(s)


# ---------------------------------------------------------------------------
# custom VJP — memory-safe autodiff for all impls
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _pairwise_lse(z, means, log_var, data_idx, ex_idx, valid, impl, block_n):
    return _pairwise_lse_fwd_impl(z, means, log_var, data_idx, ex_idx, valid,
                                  impl, block_n)


def _pairwise_lse_fwd_impl(z, means, log_var, data_idx, ex_idx, valid,
                           impl, block_n):
    z = z.astype(jnp.float32)
    means = means.astype(jnp.float32)
    log_var = log_var.astype(jnp.float32)
    if impl in ("pallas", "pallas_bf16"):
        from exemplar_vae_tpu.ops.pallas_lse import pairwise_lse_pallas
        in_dt = jnp.bfloat16 if impl == "pallas_bf16" else jnp.float32
        return pairwise_lse_pallas(z, means, log_var, data_idx, ex_idx, valid,
                                   block_n=block_n, in_dtype=in_dt)
    if impl == "scan":
        return _lse_scan(z, means, log_var, data_idx, ex_idx, valid, block_n)
    return _lse_naive(z, means, log_var, data_idx, ex_idx, valid)


def _pairwise_lse_fwd(z, means, log_var, data_idx, ex_idx, valid, impl, block_n):
    lse = _pairwise_lse_fwd_impl(z, means, log_var, data_idx, ex_idx, valid,
                                 impl, block_n)
    return lse, (z.astype(jnp.float32), means.astype(jnp.float32),
                 log_var.astype(jnp.float32), data_idx, ex_idx, valid, lse)


def _bwd_wide(z, means, log_var, data_idx, ex_idx, valid, lse, g, inv_var):
    """One-shot wide backward: recompute logits in a single (B,D)x(D,N)
    GEMM, then two (B,N)-operand GEMMs (§8h-wide). Same math and masks as
    the blockwise scan; chosen when the (B,N) weight matrix fits
    WIDE_BWD_MAX_BYTES."""
    b, d = z.shape
    logits = _mask_tile(_logits_tile(z, means, log_var, d),
                        data_idx, ex_idx, valid)
    gw = g[:, None] * jnp.exp(logits - lse[:, None])             # (B, N)
    gw_mu = jax.lax.dot_general(
        gw, means, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # (B, D)
    row = jnp.sum(gw, axis=-1, keepdims=True)
    dz = inv_var * (gw_mu - row * z)
    gwT_z = jax.lax.dot_general(
        gw, z, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # (N, D)
    col = jnp.sum(gw, axis=0)[:, None]
    dmu = inv_var * (gwT_z - col * means)
    sq_half_inv = jnp.where(logits <= NEG_INF * 0.5, 0.0,
                            -(logits + 0.5 * d * log_var))       # = sq/(2 s^2)
    dlv = jnp.sum(gw * (-0.5 * d + sq_half_inv))
    return dz, dmu, dlv, None, None, None


def _pairwise_lse_bwd(impl, block_n, res, g):
    """Softmax-weight recompute backward; matmul-dominated both ways.

    Per-pair weight w[b,n] = exp(logits[b,n] - lse[b]); then
      dz[b]     = sum_n g[b] w[b,n] (mu[n] - z[b]) / sigma^2
      dmu[n]    = sum_b g[b] w[b,n] (z[b] - mu[n]) / sigma^2
      dlogvar  += sum_{b,n} g[b] w[b,n] (-D/2 + ||z-mu||^2 / (2 sigma^2))
    Masked entries have w = 0 and contribute nothing.

    Two schedules, dispatched statically on the (B, N) footprint:
    * wide (default at train shapes): one-shot recompute, 3 large GEMMs —
      measured +3.8% headline step throughput over blockwise (6.5× on the
      standalone phase; DESIGN.md §8h-wide on the gap).
    * blockwise scan: O(B*D + N*D) memory for footprints above
      WIDE_BWD_MAX_BYTES.
    """
    z, means, log_var, data_idx, ex_idx, valid, lse = res
    # A fully-masked row (e.g. an all-padding bank shard under shard_map)
    # has lse = -inf; clamp so exp(logits - lse) stays 0, not inf.
    lse = jnp.maximum(lse, 0.5 * NEG_INF)
    b, d = z.shape
    n = means.shape[0]
    inv_var = jnp.exp(-log_var)
    if 4 * b * n <= WIDE_BWD_MAX_BYTES:
        return _bwd_wide(z, means, log_var, data_idx, ex_idx, valid, lse, g,
                         inv_var)
    gw_scale = g  # (B,)

    bn = block_n if block_n and block_n > 0 else max(n, 1)
    n_pad = _round_up(max(n, bn), bn)
    pad = n_pad - n
    means_p = jnp.pad(means, ((0, pad), (0, 0)))
    ex_p = jnp.pad(ex_idx, (0, pad), constant_values=-1)
    valid_p = jnp.pad(valid, (0, pad), constant_values=False)
    num_tiles = n_pad // bn
    means_t = means_p.reshape(num_tiles, bn, d)
    ex_t = ex_p.reshape(num_tiles, bn)
    valid_t = valid_p.reshape(num_tiles, bn)

    def body(carry, tile):
        dz_acc, dlv_acc = carry
        mu_tile, ex_tile, v_tile = tile
        logits = _mask_tile(_logits_tile(z, mu_tile, log_var, d),
                            data_idx, ex_tile, v_tile)
        w = jnp.exp(logits - lse[:, None])                       # (B, TN)
        gw = gw_scale[:, None] * w                               # (B, TN)
        # dz partial: inv_var * (gw @ mu - rowsum(gw) * z)
        gw_mu = jax.lax.dot_general(
            gw, mu_tile, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jnp.sum(gw, axis=-1, keepdims=True)
        dz_acc = dz_acc + inv_var * (gw_mu - row * z)
        # dmu tile: inv_var * (gw^T @ z - colsum(gw) * mu)
        gwT_z = jax.lax.dot_general(
            gw, z, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (TN, D)
        col = jnp.sum(gw, axis=0)[:, None]
        dmu_tile = inv_var * (gwT_z - col * mu_tile)
        # dlogvar: sum gw * (-D/2 + sq/(2 sigma^2)); recover sq from logits
        sq_half_inv = -(logits + 0.5 * d * log_var)              # = sq/(2 s^2)
        sq_half_inv = jnp.where(logits <= NEG_INF * 0.5, 0.0, sq_half_inv)
        dlv_acc = dlv_acc + jnp.sum(gw * (-0.5 * d + sq_half_inv))
        return (dz_acc, dlv_acc), dmu_tile

    init = (jnp.zeros_like(z), jnp.zeros((), jnp.float32))
    (dz, dlv), dmu_t = jax.lax.scan(body, init, (means_t, ex_t, valid_t))
    dmu = dmu_t.reshape(n_pad, d)[:n]
    return dz, dmu, dlv, None, None, None


_pairwise_lse.defvjp(_pairwise_lse_fwd, _pairwise_lse_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def exemplar_log_prob(
    z: jnp.ndarray,
    means: jnp.ndarray,
    log_var,
    *,
    log_denom,
    data_idx: Optional[jnp.ndarray] = None,
    exemplar_idx: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    impl: str = "scan",
    block_n: int = 2048,
) -> jnp.ndarray:
    """log p(z | exemplar set) for a batch of latents.

    Args:
      z: (B, D) latents.
      means: (N, D) exemplar latent means (the bank or a kNN support set).
      log_var: scalar learned log sigma^2 of the Parzen kernel.
      log_denom: scalar log of the mixture denominator — log(N) at eval,
        log(N-1) when LOO masking is active, log(N or N-1) in approximate
        mode even though only K components are evaluated (keeps the
        objective a lower bound; SURVEY.md §0.1).
      data_idx: (B,) global dataset indices of the batch (enables LOO).
      exemplar_idx: (N,) global dataset indices of the exemplars.
      valid: (N,) bool; False entries are padding and always masked.
      impl: 'naive' | 'scan' | 'pallas' | 'pallas_bf16' (bf16 kernel inputs,
        fp32 accumulation — throughput-oriented eval; parity runs use fp32).
      block_n: exemplar-axis tile size for scan/pallas.

    Returns:
      (B,) fp32 log p(z).
    """
    n = means.shape[0]
    if exemplar_idx is None:
        exemplar_idx = jnp.arange(n, dtype=jnp.int32)
        if data_idx is not None:
            raise ValueError("data_idx given without exemplar_idx")
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    log_var = jnp.asarray(log_var, jnp.float32)
    lse = _pairwise_lse(z, means, log_var, data_idx, exemplar_idx, valid,
                        impl, int(block_n))
    return lse - jnp.asarray(log_denom, jnp.float32)


def lse_combine(m1, s1, m2, s2):
    """Combine two online-LSE partial states (running max m, scaled sum s).

    Reference implementation of the combine, pinned by tests; the sharded
    prior performs the same merge collectively across all shards at once
    (pmax/psum in parallel/sharded_prior.py::_local — see the comment
    there for the stop_gradient subtlety)."""
    m = jnp.maximum(m1, m2)
    s = s1 * jnp.exp(m1 - m) + s2 * jnp.exp(m2 - m)
    return m, s
