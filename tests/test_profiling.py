"""Observability subsystem (SURVEY.md §5 rebuild equivalents)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exemplar_vae_tpu.train.profiling import StepTimer, nan_debug, trace


def test_step_timer_counts():
    t = StepTimer(images_per_step=100, distances_per_step=1000)
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones(16)
    for _ in range(3):
        with t:
            jax.block_until_ready(f(x))
    assert t.steps == 3
    r = t.report()
    assert r["images_per_sec"] > 0 and r["distances_per_sec"] > 0
    assert r["distances_per_sec"] == pytest.approx(10 * r["images_per_sec"])


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        jax.block_until_ready(jax.jit(lambda x: x @ x)(jnp.ones((32, 32))))
    found = []
    for root, _, files in os.walk(d):
        found += files
    assert found, "no profiler artifacts written"


def test_nan_debug_raises_then_restores():
    nan_debug(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(jnp.log(jnp.zeros(2) - 1.0))
    finally:
        nan_debug(False)
    # back to silent NaN
    out = jnp.log(jnp.zeros(2) - 1.0)
    assert np.isnan(np.asarray(out)).all()


def test_trainer_profile_epoch_writes_trace(tmp_path):
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment
    cfg = Config(dataset_name="synthetic", training_set_size=128,
                 val_set_size=32, test_set_size=32, number_components=128,
                 batch_size=32, epochs=1, warmup=1, S=2, MB=2,
                 hidden_size=16, z1_size=4, use_pallas_prior=False,
                 prior_block_n=32, exact_reencode_chunk=32,
                 profile_epoch=1, snapshot_dir=str(tmp_path))
    exp = Experiment(cfg, verbose=False)
    exp.train_epoch()
    assert os.path.isdir(os.path.join(exp.exp_dir, "profile"))
