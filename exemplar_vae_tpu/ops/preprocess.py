"""jit-fused on-device preprocessing (BASELINE.json north star).

The reference does per-batch preprocessing on host/GPU inside the training
loop (utils/training.py::train_one_epoch [U]: ``x = bernoulli(x)`` for
dynamic binarization; CelebA dequantization in the loader). Here both run
inside the jitted step on device:

* dynamic binarization — a fresh Bernoulli sample of the gray levels every
  step (the standard "dynamic MNIST" protocol, SURVEY.md §0.3). This applies
  to TRAINING data only: the reference binarizes val/test ONCE at load time
  with a fixed numpy seed (utils/load_data.py seeds np.random before
  binomial-sampling the eval splits [U]), so evaluation targets are fixed
  across epochs and runs. data/loaders.py reproduces that (EVAL_BIN_SEED);
  here ``train=False`` is therefore a pass-through for binary data.
* uniform dequantization for continuous data — x stored as uint8,
  (x + u)/256 with u ~ U[0,1) at train time, (x + 0.5)/256 at eval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_float(x):
    """uint8 [0,255] -> float32 [0,1]; float input passes through.

    The scale is 1/255 to match the loaders' convention for real datasets
    (binary/gray data arrives pre-divided by 255, and the one-time eval
    binarization samples p = x/255 — data/loaders.py::binarize_eval_split).
    A 1/256 scale here would train dynamic binarization against p = x/256
    while evaluating against p = x/255 targets, a systematic 255/256
    intensity skew. Continuous data does NOT go through this path: its
    (x + u)/256 dequantization keeps the logistic-256 bin convention
    (preprocess_batch below)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def preprocess_batch(key, x, *, input_type: str, dynamic_binarization: bool,
                     train: bool):
    """Device-side batch preprocessing. x: uint8 or float in [0,1]."""
    if input_type == "binary":
        xf = to_float(x)
        if dynamic_binarization and train:
            return jax.random.bernoulli(key, xf).astype(jnp.float32)
        # eval: val/test were binarized once at load time with a fixed seed
        # (data/loaders.py EVAL_BIN_SEED, matching the reference protocol),
        # so the data is already 0/1 — pass through. Evaluating against a
        # per-call re-sample would add noise to best-on-val selection and
        # make test NLL depend on the eval key (round-1 VERDICT missing #2).
        return xf
    if input_type == "continuous":
        if x.dtype == jnp.uint8:
            xi = x.astype(jnp.float32)
            if train:
                u = jax.random.uniform(key, x.shape)
            else:
                u = 0.5
            return (xi + u) / 256.0
        return to_float(x)
    # gray: logistic-256 likelihood on the raw gray levels
    return to_float(x)
