"""kNN selection over the cached exemplar-latent bank (approximate prior).

Reference: models/BaseModel.py::cache_z / get_exemplar_set [U]
(SURVEY.md §2 C7, §3.5). Semantics preserved exactly:

* the cache holds exemplar latent MEANS encoded by a (possibly stale)
  snapshot of the encoder — refreshed once per epoch, stop-gradient;
* per batch point, the K nearest cache entries by Euclidean distance are
  selected (lax.top_k over negated squared distances — one MXU matmul);
* the selected exemplars are re-encoded FRESH through the current encoder,
  with gradients (done by the caller; this module only selects).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_dist(q, bank):
    """(B, N) squared Euclidean distances via one MXU matmul."""
    q = q.astype(jnp.float32)
    bank = bank.astype(jnp.float32)
    q_sq = jnp.sum(jnp.square(q), axis=-1, keepdims=True)
    b_sq = jnp.sum(jnp.square(bank), axis=-1)[None, :]
    cross = jax.lax.dot_general(
        q, bank, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.maximum(q_sq + b_sq - 2.0 * cross, 0.0)


def knn_indices(q_means, cache_means, k: int, *, valid=None,
                block: int = 524_288):
    """Top-k nearest cache rows per query. Returns (B, k) int32 indices.

    ``valid``: optional (N,) bool mask — False rows (mesh padding of a
    bank whose size doesn't divide the device count) are excluded by
    setting their distance to +inf, so padding latents can never be
    selected as neighbors (the sharded path, make_sharded_knn_select,
    guards the same way).

    A single ``lax.top_k`` over the whole cache axis is the fast path:
    measured on v5e it beats the two-stage blocked reduction 12x at
    N=200k (1.3 ms vs 15.8 ms for B=100 — the blocked variant sorts
    nb*B narrow tiles and the tile bookkeeping dominates; numbers in
    docs/DESIGN.md §8c). The whole cutoff range is now measured (r3,
    host-fetch-synced, B=100, K=10): wide top_k runs 2.7 ms at N=524k
    and 4.8 ms at N=1,048,576 vs 103/118 ms blocked, with compile time
    flat at 1-2 s — so the single sort wins everywhere up to the 2*block
    boundary, and the compile-time blowup the blocked path was guarding
    against does not occur on this platform. The EXACT two-stage
    reduction (per-block top-k, then top-k over the nb*k candidates —
    identical result, every sort narrow) is kept only as a fallback for
    caches beyond 2*block rows, which remain unmeasured.
    """
    d = pairwise_sq_dist(q_means, jax.lax.stop_gradient(cache_means))
    if valid is not None:
        d = jnp.where(valid[None, :], d, jnp.inf)
    b, n = d.shape
    if n <= max(2 * block, 2 * k):
        _, idx = jax.lax.top_k(-d, min(k, n))
        return idx.astype(jnp.int32)
    pad = (-n) % block
    d_p = jnp.pad(d, ((0, 0), (0, pad)), constant_values=jnp.inf)
    nb = d_p.shape[1] // block
    d_t = d_p.reshape(b, nb, block)
    neg_blk, idx_blk = jax.lax.top_k(-d_t, k)          # (B, nb, k)
    base = (jnp.arange(nb, dtype=jnp.int32) * block)[None, :, None]
    cand_idx = (idx_blk.astype(jnp.int32) + base).reshape(b, nb * k)
    cand_neg = neg_blk.reshape(b, nb * k)
    _, sel = jax.lax.top_k(cand_neg, k)                # (B, k) into candidates
    return jnp.take_along_axis(cand_idx, sel, axis=1)


def dedup_valid_mask(flat_idx):
    """First-occurrence mask for a flat index vector, jit-safe (static shape).

    Used by the batch-union approximate support (SURVEY.md §3.5 "top-K
    indices per b (union over batch)"): the union of the B*K selected
    exemplar indices is represented as all B*K entries with duplicates
    masked out — a logsumexp over the masked set equals the logsumexp over
    the unique union, at static shape. Returns bool (len,), True where the
    entry is the first occurrence of its value.
    """
    order = jnp.argsort(flat_idx)
    sorted_ = flat_idx[order]
    dup_sorted = jnp.concatenate(
        [jnp.zeros((1,), bool), sorted_[1:] == sorted_[:-1]])
    dup = jnp.zeros_like(dup_sorted).at[order].set(dup_sorted)
    return ~dup


def encode_bank(model, variables, bank_images, *, chunk: int = 8192,
                remat: bool = True, pre_fn=None, pre_key=None):
    """Encode the whole exemplar bank -> (N, Dz) latent means, chunked.

    Used both for the per-epoch cache refresh (stop-gradient, reference
    cache_z [U]) and for the exact-prior differentiable bank encode.
    With ``remat``, activations are rematerialized in the backward pass so
    memory stays O(chunk) regardless of N. ``chunk <= 0`` disables chunking:
    one giant batched encode — best MXU utilization when memory allows
    (a serialized lax.map leaves the MXU idle between chunks).

    ``pre_fn(key, xc) -> xc`` preprocesses each chunk right before encoding
    (keys folded per chunk from ``pre_key``). This keeps uint8 banks raw in
    HBM — materializing a full float bank at CelebA scale (200k x 64x64x3)
    costs ~5-10 GB and OOMs a single chip.
    """
    n = bank_images.shape[0]

    def enc_direct(xc, key=None):
        if pre_fn is not None:
            xc = pre_fn(key, xc)
        return model.apply(variables, xc, method="encode_top_mean")

    if chunk is None or chunk <= 0 or chunk >= n:
        f = jax.checkpoint(enc_direct) if remat else enc_direct
        return f(bank_images, pre_key)
    chunk = min(chunk, n)
    pad = (-n) % chunk
    imgs = jnp.pad(bank_images, ((0, pad),) + ((0, 0),) * (bank_images.ndim - 1))
    enc = jax.checkpoint(enc_direct) if remat else enc_direct
    chunks = imgs.reshape((-1, chunk) + imgs.shape[1:])
    num_chunks = chunks.shape[0]
    if pre_key is None:
        pre_key = jax.random.PRNGKey(0)  # unused unless pre_fn consumes it
    keys = jax.vmap(lambda i: jax.random.fold_in(pre_key, i))(
        jnp.arange(num_chunks))
    means = jax.lax.map(lambda args: enc(*args), (chunks, keys))
    return means.reshape(-1, means.shape[-1])[:n]
