"""AdamNormGrad semantics vs a hand-written torch oracle of the reference's
update rule (SURVEY.md appendix: torch-cpu is available exactly for this)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from exemplar_vae_tpu.train.optimizer import adam_norm_grad, normalize_per_leaf


def test_normalize_per_leaf_unit_norm(rng):
    g = {"a": jnp.asarray(rng.normal(size=(7, 3)), jnp.float32),
         "b": jnp.asarray(rng.normal(size=(11,)), jnp.float32)}
    tx = normalize_per_leaf()
    out, _ = tx.update(g, tx.init(g))
    for k in g:
        np.testing.assert_allclose(float(jnp.linalg.norm(out[k])), 1.0,
                                   rtol=1e-4)


def test_zero_grad_stays_finite():
    g = {"a": jnp.zeros((4, 4))}
    tx = normalize_per_leaf()
    out, _ = tx.update(g, tx.init(g))
    assert np.isfinite(np.asarray(out["a"])).all()


def test_matches_torch_reference_update(rng):
    """3 steps of AdamNormGrad vs a hand-written torch oracle of the
    reference's OLD-TORCH update rule (vampprior utils/optimizer.py [U]):
    g <- g / (||g||_2 + 1e-7), then
    p <- p - lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps).
    NOT torch.optim.Adam — the modern optimizer moved eps inside the
    bias-corrected denominator (sqrt(v_hat)+eps), which differs from the
    reference by eps*(1/sqrt(1-b2^t)-1) per element."""
    torch = pytest.importorskip("torch")
    lr, b1, b2, eps = 5e-4, 0.9, 0.999, 1e-8
    p0 = rng.normal(size=(6, 5)).astype(np.float32)
    grads = [rng.normal(size=(6, 5)).astype(np.float32) for _ in range(3)]

    # torch oracle, reference update form
    tp = torch.tensor(p0.copy())
    m = torch.zeros_like(tp)
    v = torch.zeros_like(tp)
    for t, g in enumerate(grads, start=1):
        tg = torch.tensor(g)
        tg = tg / (tg.norm() + 1e-7)
        m = b1 * m + (1 - b1) * tg
        v = b2 * v + (1 - b2) * tg * tg
        denom = v.sqrt() + eps
        step_size = lr * (1 - b2 ** t) ** 0.5 / (1 - b1 ** t)
        tp = tp - step_size * m / denom

    # ours
    tx = adam_norm_grad(lr)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tp.numpy(),
                               atol=2e-6)


def test_reference_eps_placement_differs_from_modern_adam():
    """The reference's denom is sqrt(v)+eps (NOT sqrt(v_hat)+eps): for a
    near-zero gradient element the first-step update must differ from
    modern Adam by ~sqrt(1-b2) in the eps-dominated regime — this is the
    drift the oracle above pins, so make sure the two forms are actually
    distinguishable at the tolerance used there."""
    from exemplar_vae_tpu.train.optimizer import scale_by_reference_adam
    g = {"w": jnp.asarray([1e-12, 1.0], jnp.float32)}
    ours = scale_by_reference_adam()
    u1, _ = ours.update(g, ours.init(g))
    modern = optax.scale_by_adam(eps=1e-8)
    u2, _ = modern.update(g, modern.init(g))
    ours_small = float(u1["w"][0])
    modern_small = float(u2["w"][0])
    # eps-dominated element: reference update ~ g/( (sqrt(1-b2)|g|... ) —
    # the two placements differ by ~32x at step 1
    assert abs(modern_small) > 5 * abs(ours_small), (ours_small, modern_small)
    # well-conditioned element: both are ~1 (sign of m / sqrt(v))
    np.testing.assert_allclose(float(u1["w"][1]), float(u2["w"][1]),
                               rtol=1e-3)
