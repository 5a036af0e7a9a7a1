"""Mesh-sharded approximate-kNN exemplar prior support.

At CelebA scale the exemplar bank (images + cached latent means) does not
fit replicated; both live sharded over the ``data`` axis. The approximate
prior then needs three distributed pieces (SURVEY.md §2.3, §3.5):

1. cache refresh — each device encodes its bank shard (no collectives);
2. kNN selection — each device top-k's its cache shard against the
   (replicated) batch query means; per-shard candidates are concatenated
   over ICI and reduced to the global top-k (k << N, so the all-gather is
   (devices*K) rows per query — tiny);
3. exemplar gather — the selected global rows are fetched from the sharded
   bank with a masked local gather + psum (each row lives on exactly one
   shard, so the sum IS the gather).

All pieces run inside the jitted train step; gradients flow through the
re-encode of the gathered exemplars exactly as in the replicated path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.ops.knn import encode_bank, pairwise_sq_dist


def make_sharded_cache_refresh(model, cfg: Config, mesh: Mesh):
    """bank images sharded -> cache means sharded (stop-gradient)."""
    axis = cfg.mesh_axes[0]

    def _local(params, imgs, key):
        from exemplar_vae_tpu.train.loss import bank_pre_fn
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        if imgs.dtype == jnp.uint8:
            return encode_bank(model, {"params": params}, imgs,
                               chunk=cfg.exact_reencode_chunk, remat=False,
                               pre_fn=bank_pre_fn(cfg), pre_key=key)
        from exemplar_vae_tpu.ops.preprocess import preprocess_batch
        imgs = preprocess_batch(key, imgs, input_type=cfg.input_type,
                                dynamic_binarization=cfg.dynamic_binarization,
                                train=cfg.bank_stochastic_preprocess)
        return encode_bank(model, {"params": params}, imgs,
                           chunk=cfg.exact_reencode_chunk, remat=False)

    sharded = jax.shard_map(_local, mesh=mesh,
                            in_specs=(P(), P(axis), P()), out_specs=P(axis),
                            check_vma=False)

    @jax.jit
    def refresh(params, bank_images, key):
        return jax.lax.stop_gradient(sharded(params, bank_images, key))

    return refresh


def make_sharded_knn_select(cfg: Config, mesh: Mesh):
    """(q_means repl, cache shard, bank VALID-mask shard (bool)) ->
    (B, K) global bank ROW indices (replicated).

    The third argument is bank.valid — NOT bank.data_idx: padding rows
    must arrive as False so their distances become +inf and mesh padding
    never gets selected as a neighbor."""
    axis = cfg.mesh_axes[0]
    k = cfg.approximate_k

    def _local(q, cache_shard, valid_shard):
        n_loc = cache_shard.shape[0]
        me = jax.lax.axis_index(axis)
        d = pairwise_sq_dist(q, cache_shard)                  # (B, n_loc)
        d = jnp.where(valid_shard[None, :], d, jnp.inf)
        kk = min(k, n_loc)
        neg, idx_loc = jax.lax.top_k(-d, kk)                  # (B, kk)
        rows = idx_loc.astype(jnp.int32) + me.astype(jnp.int32) * n_loc
        dist = -neg
        if kk < k:  # pad so every shard contributes k candidates
            pad = k - kk
            rows = jnp.pad(rows, ((0, 0), (0, pad)), constant_values=0)
            dist = jnp.pad(dist, ((0, 0), (0, pad)), constant_values=jnp.inf)
        # all-gather candidates over the mesh axis -> (n_dev, B, k)
        rows_all = jax.lax.all_gather(rows, axis)
        dist_all = jax.lax.all_gather(dist, axis)
        rows_all = jnp.moveaxis(rows_all, 0, 1).reshape(q.shape[0], -1)
        dist_all = jnp.moveaxis(dist_all, 0, 1).reshape(q.shape[0], -1)
        _, sel = jax.lax.top_k(-dist_all, k)                  # (B, k) of n_dev*k
        return jnp.take_along_axis(rows_all, sel, axis=1)

    return jax.shard_map(_local, mesh=mesh,
                         in_specs=(P(), P(axis), P(axis)), out_specs=P(),
                         check_vma=False)


def make_sharded_row_gather(cfg: Config, mesh: Mesh):
    """Gather rows of a P('data')-sharded array by replicated global row
    indices: masked local gather + psum (each row is on exactly one shard)."""
    axis = cfg.mesh_axes[0]

    def _local(arr_shard, rows):
        n_loc = arr_shard.shape[0]
        row_shape = arr_shard.shape[1:]
        # flat 2D view: avoids XLA re-layout copies of big NHWC banks for
        # in-loop gathers (see train/loss.py approx branch)
        arr2d = arr_shard.reshape(n_loc, -1) if arr_shard.ndim > 1 else arr_shard
        me = jax.lax.axis_index(axis)
        local = rows - me.astype(jnp.int32) * n_loc
        in_range = (local >= 0) & (local < n_loc)
        safe = jnp.clip(local, 0, n_loc - 1)
        if arr_shard.ndim > 1:
            vals = jnp.take(arr2d, safe.reshape(-1), axis=0)
            vals = vals.reshape(rows.shape + (arr2d.shape[-1],))
        else:
            vals = jnp.take(arr_shard, safe, axis=0)
        mask = in_range.reshape(in_range.shape + (1,) * (vals.ndim - rows.ndim))
        vals = jnp.where(mask, vals, 0).astype(
            jnp.float32 if arr_shard.dtype == jnp.uint8 else vals.dtype)
        out = jax.lax.psum(vals, axis)
        if arr_shard.ndim > 1:
            out = out.reshape(rows.shape + row_shape)
        return out

    return jax.shard_map(_local, mesh=mesh,
                         in_specs=(P(axis), P()), out_specs=P(),
                         check_vma=False)


def make_sharded_approx_prior(model, cfg: Config, mesh: Mesh):
    """Returns fn(variables, out, bank, loo_idx, log_denom) -> (B,) log p(z)
    for approximate mode with SHARDED cache + bank images."""
    select = make_sharded_knn_select(cfg, mesh)
    gather = make_sharded_row_gather(cfg, mesh)
    from exemplar_vae_tpu.models.base import rows_exemplar_log_prob

    def prior_fn(variables, out, bank, loo_idx, log_denom, bank_key=None):
        rows = select(out.q_mean, bank.cache_means, bank.valid)   # (B, K)
        imgs = gather(bank.images, rows)                          # (B, K, ...)
        # int32 stays int32 through the masked-gather psum: integer
        # collectives are exact at any bank size (a float32 round-trip is
        # only exact below 2^24 — a silent-corruption hazard at larger N)
        ex_idx_bk = gather(bank.data_idx, rows)
        flat = imgs.reshape((-1,) + imgs.shape[2:])
        if bank.images.dtype == jnp.uint8:
            # raw uint8 bank: gather returned raw 0..255 values as float;
            # dequantize here (see ops/preprocess.preprocess_batch)
            from exemplar_vae_tpu.train.loss import bank_pre_fn
            if bank_key is None:
                bank_key = jax.random.PRNGKey(0)
            flat = bank_pre_fn(cfg)(bank_key, flat.astype(jnp.uint8))
        means = model.apply(variables, flat, method="encode_top_mean")
        from exemplar_vae_tpu.models.base import clamped_prior_log_var
        log_var = clamped_prior_log_var(variables["params"], cfg)
        if cfg.approximate_support == "batch_union":
            # rows/means are replicated at this level, so the union path is
            # identical to the single-device one (train/loss.py): all B*K
            # entries with duplicates masked (Config.approximate_support).
            # impl="scan" is deliberate, matching train/loss.py: the union
            # support is only B*K columns, below the Pallas win regime
            # (DESIGN.md §8b)
            from exemplar_vae_tpu.ops.exemplar_prior import exemplar_log_prob
            from exemplar_vae_tpu.ops.knn import dedup_valid_mask
            flat_rows = rows.reshape(-1)
            return exemplar_log_prob(
                out.z_top, means, log_var, log_denom=log_denom,
                data_idx=loo_idx, exemplar_idx=ex_idx_bk.reshape(-1),
                valid=dedup_valid_mask(flat_rows), impl="scan",
                block_n=cfg.prior_block_n)
        means = means.reshape(rows.shape + (means.shape[-1],))
        return rows_exemplar_log_prob(
            out.z_top, means, log_var, log_denom=log_denom,
            data_idx=loo_idx, exemplar_idx_bk=ex_idx_bk)

    return prior_fn
