"""Generation APIs (reference: models/BaseModel.py::generate_x,
reference_based_generation_x, reconstruct_x [U]; SURVEY.md §3.3).

Generative process of the exemplar prior (paper §3):
  n ~ Uniform(N);  z ~ N(mu_phi(x_n), sigma^2 I);  x_hat = decode(z)
Exemplar-conditioned ("reference-based") generation uses a *chosen* exemplar
instead of a sampled one — the data-augmentation path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.ops.preprocess import preprocess_batch


def _prep(key, x, cfg: Config):
    return preprocess_batch(key, x, input_type=cfg.input_type,
                            dynamic_binarization=cfg.dynamic_binarization,
                            train=False)


def generate_x(model, params, cfg: Config, n: int, key,
               bank_images_raw=None, n_valid: int = None):
    """Unconditional samples: (n, H, W, C) decoder means.

    ``n_valid`` bounds exemplar sampling to the real (non-padding) bank rows
    on a mesh-padded bank."""
    variables = {"params": params}
    k_pick, k_bin, k_z, k_dec = jax.random.split(key, 4)
    if cfg.prior == "standard":
        z = jax.random.normal(k_z, (n, _top_dim(cfg)))
    elif cfg.prior == "vampprior":
        u = model.apply(variables, method="get_pseudo_inputs")
        idx = jax.random.randint(k_pick, (n,), 0, u.shape[0])
        m, lv = model.apply(variables, u[idx], method="encode_top")
        z = m + jnp.exp(0.5 * lv) * jax.random.normal(k_z, m.shape)
    else:  # exemplar_prior
        hi = n_valid if n_valid is not None else bank_images_raw.shape[0]
        idx = jax.random.randint(k_pick, (n,), 0, hi)
        ex = _prep(k_bin, bank_images_raw[idx], cfg)
        mu = model.apply(variables, ex, method="encode_top_mean")
        from exemplar_vae_tpu.models.base import clamped_prior_log_var
        log_var = clamped_prior_log_var(params, cfg)
        z = mu + jnp.exp(0.5 * log_var) * jax.random.normal(k_z, mu.shape)
    return model.apply(variables, z, k_dec, method="generate_from_top")


def reference_based_generation_x(model, params, cfg: Config, key, x_ref_raw,
                                 n_per_ref: int = 1):
    """Samples conditioned on given exemplars x_ref (reference:
    reference_based_generation_x [U]). Returns (B * n_per_ref, H, W, C)."""
    variables = {"params": params}
    k_bin, k_z, k_dec = jax.random.split(key, 3)
    x_ref = _prep(k_bin, x_ref_raw, cfg)
    mu = model.apply(variables, x_ref, method="encode_top_mean")
    if n_per_ref > 1:
        mu = jnp.repeat(mu, n_per_ref, axis=0)
    from exemplar_vae_tpu.models.base import clamped_prior_log_var
    log_var = (clamped_prior_log_var(params, cfg)
               if cfg.prior == "exemplar_prior" else 0.0)
    z = mu + jnp.exp(0.5 * jnp.asarray(log_var)) * jax.random.normal(
        k_z, mu.shape)
    return model.apply(variables, z, k_dec, method="generate_from_top")


def reconstruct_x(model, params, cfg: Config, key, x_raw):
    """Posterior-mean reconstructions (visual eval)."""
    variables = {"params": params}
    k_bin, k_f = jax.random.split(key)
    x = _prep(k_bin, x_raw, cfg)
    out = model.apply(variables, x, k_f)
    return x, out.x_mean


def latent_neighbors(model, params, cfg: Config, x_query_raw, bank_images_raw,
                     cache_means, k: int, key, valid=None):
    """Latent-space kNN retrieval demo (SURVEY.md §0.4): nearest exemplars
    of each query in encoder-mean space. ``valid`` masks mesh-padding rows
    of the cache so padding latents never show up as "neighbors"."""
    from exemplar_vae_tpu.ops.knn import knn_indices
    variables = {"params": params}
    x = _prep(key, x_query_raw, cfg)
    q = model.apply(variables, x, method="encode_top_mean")
    idx = knn_indices(q, cache_means, k, valid=valid)
    return idx, bank_images_raw[idx]


def _top_dim(cfg: Config) -> int:
    return cfg.z1_size if cfg.model_name.lower() == "vae" else cfg.z2_size
