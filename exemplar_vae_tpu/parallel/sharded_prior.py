"""Mesh-sharded exact exemplar prior: blockwise pairwise-LSE per bank shard,
log-space (max, sumexp) combine over ICI.

The exemplar bank (images -> encoded latent means) is sharded over the
``data`` axis. Each device encodes its bank shard and computes the local
logsumexp of its components against the (replicated) batch latents with the
same fused kernel as the single-chip path; the global mixture is then

    lse_global[b] = m + log( psum_shards( exp(lse_local[b] - m) ) ),
    m = pmax_shards(lse_local[b])   (stop-gradient: the combine is
                                     mathematically independent of m)

which is the numerically-stable cross-shard log-sum-exp (SURVEY.md §2.3
"exemplar-bank sharding"). Leave-one-out masking works unchanged because
global dataset indices ride with each shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.ops.exemplar_prior import _pairwise_lse
from exemplar_vae_tpu.ops.knn import encode_bank


def make_sharded_exact_prior(model, cfg: Config, mesh: Mesh):
    """Returns fn(variables, z, loo_idx, bank, log_denom) -> (B,) log p(z).

    Used as ``sharded_exact_fn`` by train/loss.py in exact-train mode. The
    bank arrays must be sharded over mesh axis 'data' (axis 0) with rows
    padded to a shard multiple and ``bank.valid`` marking real rows.
    """
    axis = cfg.mesh_axes[0]
    impl = "pallas" if cfg.use_pallas_prior else "scan"

    def _local(variables, z, loo_idx, bank_images, bank_idx, bank_valid,
               bank_key):
        from exemplar_vae_tpu.train.loss import bank_pre_fn
        pre = bank_pre_fn(cfg) if bank_images.dtype == jnp.uint8 else None
        # per-device key so shards draw independent preprocessing noise
        bank_key = jax.random.fold_in(bank_key, jax.lax.axis_index(axis))
        means = encode_bank(model, variables, bank_images,
                            chunk=cfg.exact_reencode_chunk,
                            remat=cfg.exact_remat,
                            pre_fn=pre, pre_key=bank_key)
        from exemplar_vae_tpu.models.base import clamped_prior_log_var
        log_var = clamped_prior_log_var(variables["params"], cfg)
        lse_local = _pairwise_lse(z, means, log_var, loo_idx, bank_idx,
                                  bank_valid, impl, cfg.prior_block_n)
        # the collective form of ops/exemplar_prior.lse_combine (that
        # helper merges TWO partial states; here the merge runs across all
        # shards at once via pmax/psum). The stop_gradient on m is
        # load-bearing: the max is a shift, its gradient must flow only
        # through the exp(lse - m) term — keep the two implementations in
        # sync if either changes
        m = jax.lax.pmax(jax.lax.stop_gradient(lse_local), axis)
        s = jax.lax.psum(jnp.exp(lse_local - m), axis)
        return m + jnp.log(s)

    sharded = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )

    def prior_fn(variables, z, loo_idx, bank, log_denom, bank_key=None):
        if loo_idx is None:
            loo_idx = jnp.full((z.shape[0],), -1, jnp.int32)
        if bank_key is None:
            bank_key = jax.random.PRNGKey(0)
        lse = sharded(variables, z.astype(jnp.float32), loo_idx,
                      bank.images, bank.data_idx, bank.valid, bank_key)
        return lse - jnp.asarray(log_denom, jnp.float32)

    return prior_fn
