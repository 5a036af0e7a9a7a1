"""Multi-epoch cross-framework training-parity harness.

Runs the REAL JAX framework (train/trainer.Experiment — whole-epoch compiled
scan, AdamNormGrad, best-on-val selection, final IWAE) and the independent
torch re-expression (tools/torch_twin.TorchTwin) through the SAME training
trajectory: identical initial weights, identical data, identical
permutations, identical Gaussian reparameterization noise — then compares
per-epoch validation ELBO, final IWAE test NLL, and the parameter
trajectories. This is the strongest pre-real-data evidence for the 0.1-nat
parity target (round-1 VERDICT "next round" item 1): a silent mismatch in
optimizer-state dynamics, the beta schedule, best-on-val tie-breaking, the
LOO denominator, or any eval convention shows up here as a diverging
trajectory.

Noise injection: the torch side consumes the exact noise the JAX side draws,
by replaying the trainer's documented key discipline (train/trainer.py,
train/steps.py, train/evaluation.py):

  epoch e:  ekey = fold_in(PRNGKey(seed), e)
            perm = permutation(fold_in(ekey, 2), N)[:S*B]   # epoch batches
            step i: k = fold_in(fold_in(ekey, 3), i); (_, _, k_z) = split(k, 3)
                    eps = normal(k_z, (B, Z))               # reparam draw
  val:      vkey = fold_in(fold_in(key, 1_000_003), 5)
            batch i: (_, k_z) = split(fold_in(vkey, i)); eps = normal(...)
  IWAE:     ikey = fold_in(fold_in(key, 999_983), 1)
            chunk i: (_, k_s) = split(fold_in(ikey, i))
            round j: eps = normal(fold_in(k_s, j), (T*R, Z))

The config uses STATIC binary data (dynamic_binarization disabled) so the
only stochastic inputs are the permutation and the reparameterization draws
— both replayed exactly. Usage:

    /opt/venv/bin/python tools/parity_trajectory.py            # small run
    /opt/venv/bin/python tools/parity_trajectory.py --full     # VERDICT scale
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_parity(epochs=6, n_train=512, val=128, test=64, hidden=32, z=8,
               batch=64, warmup=3, S=8, MB=4, seed=7, snapshot_dir=None,
               model_name="vae", prior="exemplar_prior", n_pseudo=24,
               approximate_k=None,
               optimizer="adam_norm_grad", input_type="binary",
               conv_enc_spec="8k7s1,8k3s2,16k5s1,16k3s2",
               conv_dec_spec="t16k3s2,t8k3s2,c8k3s1", conv_proj_channels=16,
               pixelcnn_features=8, pixelcnn_layers=2,
               verbose=True):
    """-> dict with per-epoch val losses for both frameworks + final diffs.

    model_name: 'vae' (single level), 'hvae_2level' (2-level factorization
    — covers the level-1 sampled-KL conventions with TorchTwinHVAE),
    'convhvae_2level' (TorchTwinConvHVAE — pins SAME-padding conv,
    transpose-conv output semantics, NHWC flatten order, and with
    input_type='gray' the logistic-256 conv head), or 'pixelhvae_2level'
    (TorchTwinPixelHVAE — pins the PixelCNN causal-mask layout, the
    additive latent context map, relu placement, and teacher forcing).
    The conv spec defaults mirror the default architecture's kernel/stride
    pattern at reduced channels (CPU-feasible).
    prior: 'exemplar_prior' or 'vampprior' (TorchTwinVamp — pseudo-input
    mixture with per-component diagonal variances, data-seeded init).
    approximate_k: when set, TRAIN in approximate-kNN mode (BASELINE.json
    configs 3/4's training mode): stale per-epoch cache, per-row K
    selection over it, fresh differentiable re-encode of the K neighbors,
    full-set denominator, LOO on global indices — replayed independently
    on the torch side (TorchTwin approximate mode + refresh_cache at the
    same epoch boundary the trainer refreshes at). Eval stays exact in
    both frameworks.
    optimizer: 'adam_norm_grad' (reference) or 'adam' — the
    VARIANCE-REDUCED mode: AdamNormGrad's per-tensor normalization
    amplifies fp32 noise chaotically; plain Adam keeps the trajectories
    contractive, so tolerances drop ~an order of magnitude and a
    systematic sub-0.1-nat convention drift cannot hide in the envelope."""
    import jax
    import jax.numpy as jnp

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment
    from tools.torch_twin import (TorchTwin, TorchTwinConvHVAE, TorchTwinHVAE,
                                  TorchTwinPixelHVAE, TorchTwinVamp, _flatten)

    tmp = snapshot_dir or tempfile.mkdtemp(prefix="parity_")
    conv = model_name == "convhvae_2level"
    pixel = model_name == "pixelhvae_2level"
    dataset = {"binary": "synthetic", "gray": "synthetic_gray"}[input_type]
    cfg = Config(dataset_name=dataset, dynamic_binarization_override=False,
                 training_set_size=n_train, val_set_size=val,
                 test_set_size=test,
                 number_components=(n_pseudo if prior == "vampprior"
                                    else n_train),
                 use_training_data_init=(prior == "vampprior"),
                 model_name=model_name, prior=prior,
                 approximate_prior=approximate_k is not None,
                 approximate_k=approximate_k or 10,
                 hidden_size=hidden, optimizer=optimizer,
                 conv_enc_spec=conv_enc_spec, conv_dec_spec=conv_dec_spec,
                 conv_proj_channels=conv_proj_channels,
                 pixelcnn_features=pixelcnn_features,
                 pixelcnn_layers=pixelcnn_layers,
                 z1_size=z, z2_size=z, batch_size=batch, test_batch_size=val,
                 warmup=warmup, epochs=epochs, early_stopping_epochs=epochs + 1,
                 S=S, MB=MB, seed=seed, use_pallas_prior=False,
                 prior_block_n=max(64, n_train // 4),
                 exact_reencode_chunk=max(64, n_train // 4),
                 snapshot_dir=tmp)
    two_level = model_name != "vae"

    # ---------------- JAX side: the real framework -----------------------
    exp = Experiment(cfg, verbose=False)
    cfg = exp.cfg  # loader-resolved metadata (input_type, input_size, ...)
    assert not cfg.dynamic_binarization
    assert cfg.input_type == input_type
    init_params = jax.device_get(exp.state.params)
    train_x = np.asarray(exp.splits.train_x, np.float32)
    val_x = np.asarray(exp.splits.val_x, np.float32)
    test_x = np.asarray(exp.splits.test_x, np.float32)
    steps = exp.steps_per_epoch
    results = exp.run(max_epochs=epochs)
    jax_val = [json.loads(l)["val_loss"] for l in open(exp._metrics_path)
               if "val_loss" in json.loads(l)]
    jax_nll = results["test_nll"]
    jax_best = _flatten(exp.best_params)

    # ---------------- torch side: replay the same trajectory -------------
    norm_grads = optimizer == "adam_norm_grad"
    if conv:
        twin = TorchTwinConvHVAE(
            init_params, lr=cfg.lr, norm_grads=norm_grads,
            input_size=cfg.input_size, input_type=cfg.input_type,
            enc_spec=cfg.conv_enc_spec, dec_spec=cfg.conv_dec_spec,
            proj_channels=cfg.conv_proj_channels,
            approximate_k=approximate_k)
    elif pixel:
        twin = TorchTwinPixelHVAE(
            init_params, lr=cfg.lr, norm_grads=norm_grads,
            input_size=cfg.input_size, input_type=cfg.input_type,
            pixelcnn_features=cfg.pixelcnn_features,
            pixelcnn_layers=cfg.pixelcnn_layers,
            approximate_k=approximate_k)
    else:
        twin_cls = (TorchTwinVamp if prior == "vampprior"
                    else TorchTwinHVAE if two_level else TorchTwin)
        twin = twin_cls(init_params, lr=cfg.lr, norm_grads=norm_grads,
                        approximate_k=approximate_k)
    key = jax.random.PRNGKey(cfg.seed)
    bank = train_x[:n_train]

    def np_normal(k, shape):
        return np.asarray(jax.random.normal(k, shape, dtype=jnp.float32))

    def draw_eps(k_z, b):
        """Replay the model's reparam draws for one forward: the VAE uses
        its key directly; the HVAE __call__ splits it into (k2, k1)
        (models/hvae.py) — packed [eps2 | eps1] for the twin."""
        if not two_level:
            return np_normal(k_z, (b, z))
        k2, k1 = jax.random.split(k_z)
        return np.concatenate(
            [np_normal(k2, (b, z)), np_normal(k1, (b, z))], axis=-1)

    def twin_val_elbo():
        vkey = jax.random.fold_in(jax.random.fold_in(key, 1_000_003), 5)
        tot, n_seen = 0.0, 0
        tb = cfg.test_batch_size
        for i, start in enumerate(range(0, len(val_x), tb)):
            xb = val_x[start:start + tb]
            _, k_z = jax.random.split(jax.random.fold_in(vkey, i))
            loss, _, _ = twin.val_elbo(xb, draw_eps(k_z, len(xb)),
                                       bank, n_train)
            tot += loss * len(xb)
            n_seen += len(xb)
        return tot / n_seen

    torch_val, best_val, best_snap = [], float("inf"), twin.snapshot()
    for epoch in range(1, epochs + 1):
        beta = min(1.0, epoch / warmup) if warmup > 0 else 1.0
        ekey = jax.random.fold_in(key, epoch)
        if approximate_k is not None:
            # same boundary as train/trainer.py::train_epoch: the cache is
            # refreshed with the params from the END of the previous epoch,
            # BEFORE this epoch's steps (stale-cache semantics, §3.5)
            twin.refresh_cache(bank)
        perm = np.asarray(jax.random.permutation(
            jax.random.fold_in(ekey, 2), n_train)[:steps * batch]
        ).reshape(steps, batch)
        skey = jax.random.fold_in(ekey, 3)
        for i in range(steps):
            k_z = jax.random.split(jax.random.fold_in(skey, i), 3)[2]
            twin.train_step(train_x[perm[i]], perm[i], bank,
                            draw_eps(k_z, batch), beta, n_train)
        v = twin_val_elbo()
        torch_val.append(v)
        if v < best_val:
            best_val, best_snap = v, twin.snapshot()
        if verbose:
            print(f"epoch {epoch}: jax val {jax_val[epoch-1]:.4f} "
                  f"torch val {v:.4f} diff {abs(v - jax_val[epoch-1]):.2e}",
                  flush=True)

    # final IWAE with the best-on-val params (same selection rule)
    twin.load_snapshot(best_snap)
    r = min(MB, S)
    rounds = max(-(-S // r), 1)
    ikey = jax.random.fold_in(jax.random.fold_in(key, 999_983), 1)
    nlls = []
    tb = cfg.test_batch_size
    for i, start in enumerate(range(0, len(test_x), tb)):
        xc = test_x[start:start + tb]
        _, k_s = jax.random.split(jax.random.fold_in(ikey, i))
        eps = np.stack([draw_eps(jax.random.fold_in(k_s, j), len(xc) * r)
                        for j in range(rounds)])
        nlls.append(twin.iwae_chunk(xc, eps, bank, n_train))
    torch_nll = float(np.mean(np.concatenate(nlls)))

    twin_best = twin.params_numpy()
    param_diff = max(float(np.max(np.abs(np.asarray(jax_best[k], np.float32)
                                         - twin_best[k])))
                     for k in twin_best)
    out = {
        "model": model_name, "prior": prior, "optimizer": optimizer,
        "input_type": input_type, "approximate_k": approximate_k,
        "epochs": epochs, "n_train": n_train, "hidden": hidden, "z": z,
        "jax_val_per_epoch": [float(v) for v in jax_val],
        "torch_val_per_epoch": [float(v) for v in torch_val],
        "max_val_diff": float(max(abs(a - b)
                                  for a, b in zip(jax_val, torch_val))),
        "jax_test_nll": float(jax_nll), "torch_test_nll": float(torch_nll),
        "nll_diff": float(abs(jax_nll - torch_nll)),
        "max_param_diff": param_diff,
    }
    if verbose:
        print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    k = 10 if "--approx" in sys.argv else None
    if "--full" in sys.argv:
        out = run_parity(epochs=20, n_train=2048, val=512, test=256,
                         hidden=64, z=16, batch=100, warmup=10, S=64, MB=16,
                         approximate_k=k)
    else:
        out = run_parity(approximate_k=k)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "parity_trajectory.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")
