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
    """3 steps of AdamNormGrad vs the reference rule implemented in torch:
    g <- g / (||g||_2 + 1e-7), then Adam(lr, (0.9, 0.999), eps=1e-8)."""
    torch = pytest.importorskip("torch")
    lr = 5e-4
    p0 = rng.normal(size=(6, 5)).astype(np.float32)
    grads = [rng.normal(size=(6, 5)).astype(np.float32) for _ in range(3)]

    # torch oracle
    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, betas=(0.9, 0.999), eps=1e-8)
    for g in grads:
        opt.zero_grad()
        tg = torch.tensor(g)
        tg = tg / (tg.norm() + 1e-7)
        tp.grad = tg
        opt.step()

    # ours
    tx = adam_norm_grad(lr)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), atol=2e-6)
