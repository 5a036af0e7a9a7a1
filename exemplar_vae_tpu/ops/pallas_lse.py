"""Fused Pallas TPU kernel for the exemplar-prior pairwise log-sum-exp.

Computes, for each batch latent z_b, the logsumexp over N exemplar components

    lse[b] = logsumexp_n [ -0.5 * (D*log_var + ||z_b - mu_n||^2 / sigma^2) ]

without ever materializing the (B, N) logits matrix: the grid tiles
(B_tile x N_tile) blocks, the cross term ``z @ mu^T`` runs on the MXU, and a
flash-attention-style online (running-max, running-sumexp) accumulator lives
in VMEM scratch across the N-axis grid dimension.

Masking (leave-one-out + padding) is done by integer comparison of global
dataset indices inside the kernel (SURVEY.md §0.1, §7.1): an exemplar index of
``PAD_IDX`` is always masked; a match against the batch's data index is the
LOO mask.

Replaces the reference's broadcasted torch ops
(utils/distributions.py::log_normal_diag_vectorized [U]) — the O(MB*N*D) hot
loop called from models/BaseModel.py::log_p_z [U].

Gradients: this kernel is only the *forward*; ops/exemplar_prior.py wraps all
implementations in one custom VJP whose backward recomputes softmax weights
blockwise (matmul-dominated, memory O(B*D + N*D)).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
PAD_IDX = -2          # exemplar-index sentinel: always masked
NO_LOO_IDX = -1       # batch-index sentinel: matches nothing


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lse_kernel(z_ref, mu_ref, lv_ref, didx_ref, eidx_ref, out_ref,
                m_scr, s_scr, *, true_d: float):
    j = pl.program_id(1)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        s_scr[:] = jnp.zeros_like(s_scr)

    log_var = lv_ref[0, 0]
    z = z_ref[:]                                   # (TB, Dp) fp32 or bf16
    mu = mu_ref[:]                                 # (TN, Dp) fp32 or bf16
    # bf16 inputs ride the MXU natively; accumulation is always fp32.
    # precision is pinned to DEFAULT: inheriting an ambient
    # jax.default_matmul_precision('float32') context makes Mosaic reject
    # the bf16 matmul ('Bad lhs type' on contract_precision<fp32>)
    cross = jax.lax.dot_general(
        z, mu, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)       # (TB, TN)
    z32 = z.astype(jnp.float32)
    mu32 = mu.astype(jnp.float32)
    z_sq = jnp.sum(z32 * z32, axis=-1, keepdims=True)  # (TB, 1)
    mu_sq = jnp.sum(mu32 * mu32, axis=-1)[None, :]     # (1, TN)
    sq = jnp.maximum(z_sq + mu_sq - 2.0 * cross, 0.0)
    logits = -0.5 * (true_d * log_var + sq * jnp.exp(-log_var))

    eidx = eidx_ref[:]                             # (1, TN) int32
    didx = didx_ref[:]                             # (TB, 1) int32
    masked = (eidx == PAD_IDX) | (didx == eidx)    # (TB, TN) via broadcast
    logits = jnp.where(masked, NEG_INF, logits)

    m_old = m_scr[:]                               # (TB, 1)
    m_tile = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_old, m_tile)
    s_new = s_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=-1, keepdims=True)
    m_scr[:] = m_new
    s_scr[:] = s_new

    @pl.when(j == num_j - 1)
    def _():
        out_ref[:] = m_scr[:] + jnp.log(s_scr[:])


def pairwise_lse_pallas(z, means, log_var, data_idx, ex_idx, valid,
                        *, block_n: int = 2048, block_b: int = 0,
                        in_dtype=jnp.float32, interpret: bool | None = None):
    """Public entry. Shapes: z (B, D); means (N, D); log_var scalar;
    data_idx (B,) int32 or None; ex_idx (N,) int32; valid (N,) bool.
    Returns (B,) fp32 logsumexp (no denominator).

    block_b=0 auto-picks the batch tile: the bank streams from HBM once per
    batch tile, so large-B (eval) calls want big tiles — measured on v5e,
    tb=512 cuts the B=32k bank traffic 4x vs tb=128 (docs/DESIGN.md §8).
    in_dtype=bfloat16 halves bank HBM traffic and rides the MXU at bf16
    rate; the LSE accumulation stays fp32 (use for throughput-oriented
    eval only — parity runs keep fp32 inputs)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_n <= 0:
        raise ValueError(f"block_n must be positive, got {block_n}")
    b, d = z.shape
    n = means.shape[0]
    true_d = d
    if block_b <= 0:
        block_b = 512 if b >= 2048 else 128

    # pad D to the lane width — zero padding is exact for squared distances
    dp = _round_up(max(d, 128), 128)
    bp = _round_up(max(b, 8), block_b) if b > block_b else _round_up(b, 8)
    tb = min(block_b, bp)
    bp = _round_up(bp, tb)
    tn = min(block_n, _round_up(n, 128))
    if not interpret and tn % 128:
        raise ValueError(
            f"block_n={block_n} gives an exemplar-axis tile of {tn}, which "
            f"TPU Mosaic lowering requires to be a multiple of 128 (the "
            f"lane width); use a multiple of 128 (Config.prior_block_n)")
    np_ = _round_up(max(n, tn), tn)

    z_p = jnp.pad(z.astype(in_dtype), ((0, bp - b), (0, dp - d)))
    mu_p = jnp.pad(means.astype(in_dtype), ((0, np_ - n), (0, dp - d)))
    if data_idx is None:
        didx = jnp.full((bp, 1), NO_LOO_IDX, jnp.int32)
    else:
        didx = jnp.pad(data_idx.astype(jnp.int32), (0, bp - b),
                       constant_values=NO_LOO_IDX)[:, None]
    eidx_eff = jnp.where(valid, ex_idx.astype(jnp.int32), PAD_IDX)
    eidx = jnp.pad(eidx_eff, (0, np_ - n), constant_values=PAD_IDX)[None, :]
    lv = jnp.asarray(log_var, jnp.float32).reshape(1, 1)

    grid = (bp // tb, np_ // tn)
    kernel = functools.partial(_lse_kernel, true_d=float(true_d))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * dp + 6 * bp * np_,
            bytes_accessed=(bp * dp + np_ * dp + bp) * 4,
            transcendentals=2 * bp * np_,
        ),
        interpret=interpret,
    )(z_p, mu_p, lv, didx, eidx)
    return out[:b, 0]
