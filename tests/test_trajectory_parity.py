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
