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


def knn_indices(q_means, cache_means, k: int, *, valid=None):
    """Top-k nearest cache rows per query. Returns (B, k) int32 indices.

    ``valid``: optional (N,) bool mask — False rows (mesh padding of a
    bank whose size doesn't divide the device count) are excluded by
    setting their distance to +inf, so padding latents can never be
    selected as neighbors (the sharded path, make_sharded_knn_select,
    guards the same way).

    One ``lax.top_k`` over the whole cache axis, at every size. History:
    round 1 shipped an exact two-stage blocked reduction on a compile-time
    assumption; round 3 measured the single sort beating it 12-25x up to
    2^20 rows but kept the blocked variant as an UNMEASURED fallback
    beyond that; round 4 measured the fallback region (v5e, B=100, K=10,
    host-fetch-synced, KNN_WIDE.json): wide runs 16 ms at 2^21 rows,
    26.8 ms at 2^22, 47 ms at 2^23 — linear in N with flat compile —
    while the blocked path takes 531/640 ms at 2M/4M (the nb*B narrow-
    tile sorts' bookkeeping dominates). The blocked path lost everywhere
    it was ever measured and is deleted; ties break to the lowest index
    (lax.top_k semantics, pinned in tests/test_knn_and_preprocess.py).
    """
    d = pairwise_sq_dist(q_means, jax.lax.stop_gradient(cache_means))
    if valid is not None:
        d = jnp.where(valid[None, :], d, jnp.inf)
    _, idx = jax.lax.top_k(-d, min(k, d.shape[1]))
    return idx.astype(jnp.int32)


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
