"""AdamNormGrad as an optax GradientTransformation.

The reference's optimizer (utils/optimizer.py::AdamNormGrad [U], inherited
from the vampprior codebase) is Adam where each parameter tensor's gradient
is L2-normalized — ``g <- g / (||g||_2 + 1e-7)`` per tensor — before the
moment updates. Preserving this exactly matters for NLL parity
(SURVEY.md §7.3 item 2: "AdamNormGrad semantics").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

NORM_EPS = 1e-7


def normalize_per_leaf() -> optax.GradientTransformation:
    """g <- g / (||g||_2 + 1e-7), independently for every parameter tensor."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def norm_one(g):
            n = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            return (g / (n + NORM_EPS)).astype(g.dtype)

        return jax.tree.map(norm_one, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_reference_adam(b1: float = 0.9, b2: float = 0.999,
                            eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam in the reference AdamNormGrad's (old-torch) update form [U]:

        m <- b1 m + (1-b1) g ;  v <- b2 v + (1-b2) g^2
        update = sqrt(1 - b2^t) / (1 - b1^t) * m / (sqrt(v) + eps)

    Modern Adam (optax.scale_by_adam, current torch.optim.Adam) divides by
    sqrt(v_hat) + eps instead — algebraically the reference's EFFECTIVE eps
    is eps / sqrt(1 - b2^t), ~32x larger at step 1 — so for elements whose
    sqrt(v) is near eps the early-training updates differ materially.
    Pinned against a hand-written torch oracle of the reference rule in
    tests/test_optimizer.py."""

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        c = count.astype(jnp.float32)
        step_scale = jnp.sqrt(1.0 - b2 ** c) / (1.0 - b1 ** c)
        out = jax.tree.map(lambda m, v: step_scale * m / (jnp.sqrt(v) + eps),
                           mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adam_norm_grad(lr: float, b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """AdamNormGrad: per-tensor grad normalization, then Adam in the
    reference's exact update form (see scale_by_reference_adam)."""
    return optax.chain(
        normalize_per_leaf(),
        scale_by_reference_adam(b1=b1, b2=b2, eps=eps),
        optax.scale(-lr),
    )


def plain_adam(lr: float, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    """Standard Adam with the same hyperparameters, WITHOUT the per-tensor
    gradient normalization. Not a reference mode — used by the
    variance-reduced trajectory-parity harness (tools/parity_trajectory.py):
    AdamNormGrad amplifies fp32 noise chaotically (normalizing a near-zero
    gradient tensor multiplies its noise up to unit scale), which forces
    loose cross-framework tolerances; plain Adam keeps trajectories
    contractive so a systematic convention drift can't hide inside the
    chaos envelope."""
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale(-lr),
    )


def make_optimizer(cfg) -> optax.GradientTransformation:
    """cfg.optimizer -> GradientTransformation."""
    if cfg.optimizer == "adam_norm_grad":
        return adam_norm_grad(cfg.lr)
    if cfg.optimizer == "adam":
        return plain_adam(cfg.lr)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
