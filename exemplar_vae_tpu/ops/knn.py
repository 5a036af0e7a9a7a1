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


def knn_indices(q_means, cache_means, k: int):
    """Top-k nearest cache rows per query. Returns (B, k) int32 indices."""
    d = pairwise_sq_dist(q_means, jax.lax.stop_gradient(cache_means))
    _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def encode_bank(model, variables, bank_images, *, chunk: int = 8192,
                remat: bool = True):
    """Encode the whole exemplar bank -> (N, Dz) latent means, chunked.

    Used both for the per-epoch cache refresh (stop-gradient, reference
    cache_z [U]) and for the exact-prior differentiable bank encode.
    With ``remat``, activations are rematerialized in the backward pass so
    memory stays O(chunk) regardless of N. ``chunk <= 0`` disables chunking:
    one giant batched encode — best MXU utilization when memory allows
    (a serialized lax.map leaves the MXU idle between chunks).
    """
    n = bank_images.shape[0]

    def enc_direct(xc):
        return model.apply(variables, xc, method="encode_top_mean")

    if chunk is None or chunk <= 0 or chunk >= n:
        f = jax.checkpoint(enc_direct) if remat else enc_direct
        return f(bank_images)
    chunk = min(chunk, n)
    pad = (-n) % chunk
    imgs = jnp.pad(bank_images, ((0, pad),) + ((0, 0),) * (bank_images.ndim - 1))
    enc = jax.checkpoint(enc_direct) if remat else enc_direct
    chunks = imgs.reshape((-1, chunk) + imgs.shape[1:])
    means = jax.lax.map(enc, chunks)
    return means.reshape(-1, means.shape[-1])[:n]
