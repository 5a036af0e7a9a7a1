"""Multi-epoch cross-framework training parity (round-1 VERDICT item 1).

Drives the REAL JAX training stack (Experiment: compiled epoch scan,
AdamNormGrad, beta warm-up, best-on-val selection, final IWAE) and the
independent torch re-expression (tools/torch_twin) through the same
trajectory on identical data + noise, and asserts the end-to-end agreement
that single-step parity tests cannot: optimizer-state dynamics, the beta
schedule, best-on-val selection, and every eval convention all have to match
for these numbers to line up after several epochs.

Measured at this scale (see parity_trajectory.json for the full-size run):
val-ELBO diff ~5e-4 nats, IWAE diff ~5e-4 nats, params ~5e-7 — pure fp32
accumulation noise between two independent implementations.
"""

import pytest

torch = pytest.importorskip("torch")

from tools.parity_trajectory import run_parity  # noqa: E402


def test_multi_epoch_training_trajectory_matches_torch(tmp_path):
    out = run_parity(epochs=4, n_train=256, val=64, test=32, hidden=32, z=8,
                     batch=64, warmup=2, S=8, MB=4, seed=7,
                     snapshot_dir=str(tmp_path), verbose=False)
    # final val-ELBO and IWAE NLL within 0.02 nats (VERDICT target ~0.02)
    assert out["max_val_diff"] < 2e-2, out
    assert out["nll_diff"] < 2e-2, out
    # parameter trajectories stay together to ~1e-4
    assert out["max_param_diff"] < 1e-4, out
    # and training actually progressed (the comparison is not vacuous)
    assert out["jax_val_per_epoch"][-1] < out["jax_val_per_epoch"][0] - 1.0


def test_vamp_trajectory_matches_torch(tmp_path):
    """Third prior family end-to-end: the VAMP pseudo-input mixture
    (trainable pseudo-inputs with data-seeded init, hardtanh [0,1] at use,
    per-component diagonal variances, log C denominator with no LOO)
    tracks the torch twin within the fp32-chaos envelope (see the HVAE
    test's tolerance rationale)."""
    out = run_parity(epochs=3, n_train=256, val=64, test=32, hidden=32, z=8,
                     batch=64, warmup=2, S=8, MB=4, seed=7,
                     prior="vampprior", n_pseudo=24,
                     snapshot_dir=str(tmp_path), verbose=False)
    assert out["max_val_diff"] < 1e-1, out
    assert out["nll_diff"] < 1e-1, out
    assert out["max_param_diff"] < 3e-2, out
    assert out["jax_val_per_epoch"][-1] < out["jax_val_per_epoch"][0] - 1.0


def test_hvae_trajectory_matches_torch(tmp_path):
    """Same end-to-end agreement for the 2-level model: additionally pins
    the level-1 sampled-KL convention (q(z1|x,z2) vs p(z1|z2) rides inside
    KL), the (k2, k1) key-split order, and the q/p logvar clamps.

    Tolerances are looser than the VAE case (0.1 vs 0.02 nats): a single
    HVAE forward matches to ~1e-4 (pure fp32 round-off, verified while
    building the twin), but AdamNormGrad's per-tensor gradient
    normalization amplifies that noise chaotically over steps — measured
    drift at 3 epochs is ~0.03 nats / 3e-3 params with NO systematic
    component. A real convention bug (KL sign, clamp range, key order,
    denominator) moves these numbers by whole nats."""
    out = run_parity(epochs=3, n_train=256, val=64, test=32, hidden=32, z=8,
                     batch=64, warmup=2, S=8, MB=4, seed=7,
                     model_name="hvae_2level",
                     snapshot_dir=str(tmp_path), verbose=False)
    assert out["max_val_diff"] < 1e-1, out
    assert out["nll_diff"] < 1e-1, out
    assert out["max_param_diff"] < 3e-2, out
    assert out["jax_val_per_epoch"][-1] < out["jax_val_per_epoch"][0] - 1.0


@pytest.mark.slow
def test_conv_trajectory_matches_torch(tmp_path):
    """ConvHVAE end-to-end (round-2 VERDICT next-round item 1): pins the
    conv conventions the flagship parity configs ride on — flax SAME
    padding (asymmetric for k3/s2 on even sizes), lax.conv_transpose SAME
    output semantics (in*stride, pad_len=k+s-2 rule, no kernel flip), the
    NHWC flatten order between conv stacks and dense heads, and the
    gated-conv channel split. Spec mirrors the default architecture's
    kernel/stride pattern (7s1,3s2,5s1,3s2 / t3s2,t3s2,3s1) at reduced
    channels. Measured at this scale: 1.2e-4 nats val, 3.5e-6 params."""
    out = run_parity(epochs=3, n_train=256, val=64, test=32, hidden=32, z=8,
                     batch=64, warmup=2, S=8, MB=4, seed=7,
                     model_name="convhvae_2level",
                     snapshot_dir=str(tmp_path), verbose=False)
    assert out["max_val_diff"] < 5e-2, out
    assert out["nll_diff"] < 5e-2, out
    assert out["max_param_diff"] < 1e-2, out
    assert out["jax_val_per_epoch"][-1] < out["jax_val_per_epoch"][0] - 1.0


@pytest.mark.slow
def test_conv_gray_logistic256_trajectory_matches_torch(tmp_path):
    """ConvHVAE with input_type='gray' — additionally pins the
    logistic-256 CONV head (sigmoid mean clipped to [1/512, 1-1/512],
    log-var hardtanh [-4.5, 0], CDF-difference bins) end-to-end, in the
    variance-reduced plain-Adam mode so the tolerance is tight (measured:
    4.9e-4 nats with AdamNormGrad, 1.2e-4 with adam at this scale)."""
    out = run_parity(epochs=3, n_train=256, val=64, test=32, hidden=32, z=8,
                     batch=64, warmup=2, S=8, MB=4, seed=7,
                     model_name="convhvae_2level", input_type="gray",
                     optimizer="adam",
                     snapshot_dir=str(tmp_path), verbose=False)
    assert out["max_val_diff"] < 1e-2, out
    assert out["nll_diff"] < 1e-2, out
    assert out["max_param_diff"] < 1e-3, out
    assert out["jax_val_per_epoch"][-1] < out["jax_val_per_epoch"][0] - 1.0


def test_pixel_trajectory_matches_torch(tmp_path):
    """PixelHVAE end-to-end (the lineage's fourth family): pins the
    PixelCNN conventions no other twin touches — the causal-mask layout
    (type 'A' 5x5 input layer excludes the center pixel, type 'B' 3x3
    stack includes it; all rows below blocked), the additive latent
    context map ctx_proj(z1||z2) applied at EVERY layer, relu placement
    (between layers and before the heads, not on the pixel input), and
    teacher forcing (one parallel masked pass). AdamNormGrad mode, so the
    HVAE test's chaos-envelope tolerances apply; the variance-reduced
    parametrized case below asserts the tight bound (measured 6.7e-4
    nats / 6.9e-5 params with adam at this scale)."""
    out = run_parity(epochs=3, n_train=256, val=64, test=32, hidden=32, z=8,
                     batch=64, warmup=2, S=8, MB=4, seed=7,
                     model_name="pixelhvae_2level",
                     snapshot_dir=str(tmp_path), verbose=False)
    assert out["max_val_diff"] < 1e-1, out
    assert out["nll_diff"] < 1e-1, out
    assert out["max_param_diff"] < 3e-2, out
    assert out["jax_val_per_epoch"][-1] < out["jax_val_per_epoch"][0] - 1.0


def test_approximate_knn_trajectory_matches_torch(tmp_path):
    """Approximate-kNN TRAINING trajectory (round-3 VERDICT item 3): the
    mode BASELINE.json configs 3/4 actually train in. Pins, with
    cross-framework trajectory evidence, every convention of the approx
    path: the stale-cache epoch boundary (refresh with end-of-previous-
    epoch params, BEFORE the epoch's steps), per-row K selection over the
    cache by squared Euclidean distance from q_mean (top-k ties to the
    lowest index — see test_knn_and_preprocess.py duplicate-distance pin),
    the fresh differentiable re-encode of the selected exemplars, the LOO
    mask on global indices inside the per-row mixture, and the FULL-set
    log(N-1) denominator. Variance-reduced (plain Adam) so the tolerance
    is tight; measured at this scale: 3.1e-4 nats val, 1.2e-4 IWAE,
    4.2e-6 params."""
    out = run_parity(epochs=4, n_train=256, val=64, test=32, hidden=32, z=8,
                     batch=32, warmup=2, S=8, MB=4, seed=7,
                     optimizer="adam", approximate_k=4,
                     snapshot_dir=str(tmp_path), verbose=False)
    assert out["max_val_diff"] < 1e-2, out
    assert out["nll_diff"] < 1e-2, out
    assert out["max_param_diff"] < 1e-4, out
    assert out["jax_val_per_epoch"][-1] < out["jax_val_per_epoch"][0] - 1.0


@pytest.mark.parametrize("model_name,prior,param_tol", [
    ("vae", "exemplar_prior", 1e-5),
    ("hvae_2level", "exemplar_prior", 1e-5),
    ("vae", "vampprior", 1e-2),  # pseudo-input pixels take large raw grads
    ("pixelhvae_2level", "exemplar_prior", 1e-3),
])
def test_variance_reduced_trajectories_tight(tmp_path, model_name, prior,
                                             param_tol):
    """Round-2 VERDICT item 4: the loose 0.1-nat twin tolerances could hide
    a systematic sub-0.1-nat convention drift behind AdamNormGrad's chaos
    (normalizing near-zero gradient tensors amplifies fp32 noise to unit
    scale). With plain Adam — same model, same data, same noise — the
    trajectories are contractive, and measured drift collapses to ~2-4e-4
    nats / <5e-7 params (vamp pseudo-inputs 4.5e-3). Asserting at 1e-2
    nats means any systematic drift bigger than noise now fails."""
    out = run_parity(epochs=3, n_train=256, val=64, test=32, hidden=32, z=8,
                     batch=64, warmup=2, S=8, MB=4, seed=7,
                     model_name=model_name, prior=prior, optimizer="adam",
                     n_pseudo=24, snapshot_dir=str(tmp_path), verbose=False)
    assert out["max_val_diff"] < 1e-2, out
    assert out["nll_diff"] < 1e-2, out
    assert out["max_param_diff"] < param_tol, out
    assert out["jax_val_per_epoch"][-1] < out["jax_val_per_epoch"][0] - 1.0
