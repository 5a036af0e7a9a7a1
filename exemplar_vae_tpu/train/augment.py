"""Exemplar-guided generative data augmentation
(reference: classify_mnist.py [name L, mechanism H] — SURVEY.md §3.4, §2 C15).

Mechanism preserved: train a permutation-invariant MLP classifier where each
minibatch example is, with probability ``pi``, replaced by an Exemplar-VAE
sample conditioned on it (label-preserving neighborhood sample:
z ~ N(mu_phi(x), sigma^2 I) -> decode). Report test error vs the plain
classifier (paper reports ~0.69% vs ~1.1-1.4% on MNIST).

TPU-native: the VAE encode->sample->decode augmentation runs INSIDE the
jitted classifier train step — zero host round-trips.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.ops.preprocess import preprocess_batch


class MLPClassifier(nn.Module):
    """Permutation-invariant MLP (reference classifier [U])."""
    n_classes: int = 10
    hidden: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.reshape(x.shape[0], -1)
        h = nn.relu(nn.Dense(self.hidden)(h))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(self.n_classes)(h)


class ClassifierResult(NamedTuple):
    test_error: float
    train_seconds: float
    history: list


def make_augment_fn(vae_model, vae_params, cfg: Config):
    """x -> exemplar-conditioned sample of x (label-preserving)."""
    variables = {"params": vae_params}
    from exemplar_vae_tpu.models.base import clamped_prior_log_var
    sigma2_logvar = (clamped_prior_log_var(vae_params, cfg)
                     if cfg.prior == "exemplar_prior" else jnp.float32(0.0))

    def augment(key, x):
        k_z, k_dec = jax.random.split(key)
        mu = vae_model.apply(variables, x, method="encode_top_mean")
        z = mu + jnp.exp(0.5 * sigma2_logvar) * jax.random.normal(
            k_z, mu.shape)
        return vae_model.apply(variables, z, k_dec,
                               method="generate_from_top")

    return augment


def train_classifier(vae_model, vae_params, cfg: Config, splits, *,
                     pi: float = 0.5, epochs: int = 30, lr: float = 1e-3,
                     batch_size: int = 100, seed: int = 0,
                     augment: bool = True, label_budget: int = 0,
                     verbose: bool = False):
    """Train the (optionally augmented) classifier; return test error.

    label_budget > 0 subsamples the labeled training set to that many
    examples (a fixed per-seed choice): generative augmentation matters
    when the classifier is data-limited — on easily-separable data a
    full-set classifier saturates and the comparison is floor-limited."""
    if splits.train_labels is None:
        raise ValueError("dataset has no labels; classifier needs them")
    n_classes = int(np.max(splits.train_labels)) + 1
    clf = MLPClassifier(n_classes=n_classes)
    key = jax.random.PRNGKey(seed)
    x_np = np.asarray(splits.train_x)
    y_np = np.asarray(splits.train_labels.astype(np.int32))
    if label_budget and label_budget < len(x_np):
        sel = np.asarray(jax.random.permutation(
            jax.random.fold_in(key, 0xBEEF), len(x_np)))[:label_budget]
        x_np, y_np = x_np[sel], y_np[sel]
    x_all = jnp.asarray(x_np)
    y_all = jnp.asarray(y_np)
    batch_size = min(batch_size, len(x_np))
    c, h, w = cfg.input_size
    params = clf.init(key, jnp.zeros((2, h, w, c)))["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    aug_fn = make_augment_fn(vae_model, vae_params, cfg) if augment else None

    def loss_fn(params, x, y):
        logits = clf.apply({"params": params}, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def epoch_fn(params, opt_state, ekey):
        n = x_all.shape[0]
        steps = n // batch_size
        perm = jax.random.permutation(ekey, n)[:steps * batch_size]
        perm = perm.reshape(steps, batch_size)

        def body(carry, idx):
            params, opt_state, i = carry
            k = jax.random.fold_in(ekey, i)
            k_bin, k_aug, k_mask = jax.random.split(k, 3)
            x = preprocess_batch(k_bin, x_all[idx],
                                 input_type=cfg.input_type,
                                 dynamic_binarization=cfg.dynamic_binarization,
                                 train=True)
            if aug_fn is not None:
                x_gen = aug_fn(k_aug, x)
                mask = jax.random.bernoulli(k_mask, pi, (x.shape[0],))
                x = jnp.where(mask[:, None, None, None], x_gen, x)
            y = y_all[idx]
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, i + 1), loss

        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, 0), perm)
        return params, opt_state, jnp.mean(losses)

    @jax.jit
    def error_rate(params, x_raw, y, key):
        x = preprocess_batch(key, x_raw, input_type=cfg.input_type,
                             dynamic_binarization=cfg.dynamic_binarization,
                             train=False)
        logits = clf.apply({"params": params}, x)
        return jnp.mean(jnp.argmax(logits, -1) != y)

    history = []
    t0 = time.perf_counter()
    for e in range(1, epochs + 1):
        params, opt_state, tr_loss = epoch_fn(params, opt_state,
                                              jax.random.fold_in(key, e))
        history.append(float(tr_loss))
        if verbose:
            print(f"clf epoch {e}: loss={float(tr_loss):.4f}", flush=True)
    test_x = jnp.asarray(splits.test_x)
    test_y = jnp.asarray(splits.test_labels.astype(np.int32))
    err = float(error_rate(params, test_x, test_y,
                           jax.random.fold_in(key, 10_000_019)))
    return ClassifierResult(err, time.perf_counter() - t0, history)


def load_experiment(exp_dir: str):
    """Rebuild an Experiment from a snapshot dir and load its best params
    (for the augmentation pipeline and post-hoc analysis).

    Restores from the DIRECTORY GIVEN — not the path the saved config would
    derive (config.json carries the original snapshot_dir, which goes stale
    the moment a run dir is moved, copied, or read from a different cwd).
    Raises if no checkpoint restores: silently returning freshly-initialized
    params would let a serving export or classifier study run on untrained
    weights."""
    import os
    from exemplar_vae_tpu.train.trainer import Experiment
    with open(os.path.join(exp_dir, "config.json")) as f:
        cfg = Config.from_json(f.read())
    exp = Experiment(cfg, verbose=False, exp_dir=exp_dir)
    for tag in ("final", "last"):
        if exp.restore_checkpoint(tag):
            return exp
    raise FileNotFoundError(
        f"no restorable checkpoint (ckpt_final or ckpt_last) under "
        f"{exp_dir!r} — the run may have crashed before its first save; "
        f"refusing to hand back untrained parameters")
