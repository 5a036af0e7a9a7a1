"""Exemplar-guided augmentation classifier (SURVEY.md §3.4, C15)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.models import create_model
from exemplar_vae_tpu.train.augment import (MLPClassifier, make_augment_fn,
                                            train_classifier)
from exemplar_vae_tpu.data import load_dataset


@pytest.fixture(scope="module")
def vae_setup():
    cfg = Config(dataset_name="synthetic", model_name="vae",
                 prior="exemplar_prior", hidden_size=32, z1_size=8,
                 training_set_size=256, val_set_size=64, test_set_size=128)
    splits, cfg = load_dataset(cfg)
    m = create_model(cfg)
    k = jax.random.PRNGKey(0)
    x = jnp.asarray(splits.train_x[:2])
    v = m.init(k, x, k)
    return cfg, m, v["params"], splits


def test_augment_fn_label_preserving_shape(vae_setup):
    cfg, m, params, splits = vae_setup
    aug = make_augment_fn(m, params, cfg)
    x = jnp.asarray(splits.train_x[:6])
    out = aug(jax.random.PRNGKey(1), x)
    assert out.shape == x.shape
    arr = np.asarray(out)
    assert (arr >= 0).all() and (arr <= 1).all()
    # conditioned on different exemplars -> different samples
    assert not np.allclose(arr[0], arr[1])


def test_classifier_learns_with_and_without_augmentation(vae_setup):
    cfg, m, params, splits = vae_setup
    r_plain = train_classifier(m, params, cfg, splits, epochs=8,
                               augment=False, seed=1)
    assert r_plain.test_error < 0.5  # 10 classes, random = 0.9
    r_aug = train_classifier(m, params, cfg, splits, epochs=8, pi=0.3,
                             augment=True, seed=1)
    assert r_aug.test_error < 0.7
    assert np.isfinite(r_aug.history).all()


def test_classifier_label_budget_subsamples(vae_setup):
    """label_budget caps the labeled set (and the batch size adapts);
    training still runs and returns a finite error."""
    cfg, m, params, splits = vae_setup
    r = train_classifier(m, params, cfg, splits, epochs=4, augment=False,
                         label_budget=50, batch_size=100, seed=3)
    assert np.isfinite(r.test_error)
    assert len(r.history) == 4


def test_classifier_requires_labels(vae_setup):
    cfg, m, params, splits = vae_setup
    splits2 = splits._replace(train_labels=None)
    with pytest.raises(ValueError):
        train_classifier(m, params, cfg, splits2)


def test_load_experiment_moved_dir_and_missing_checkpoint(tmp_path):
    """load_experiment restores from the DIRECTORY GIVEN (a moved/copied
    run dir keeps working even though config.json's snapshot_dir went
    stale), and raises instead of silently returning untrained params when
    no checkpoint exists (round-3 review finding: a serving export from a
    crashed run would otherwise ship random weights)."""
    import shutil
    from exemplar_vae_tpu.train.augment import load_experiment
    from exemplar_vae_tpu.train.trainer import Experiment
    cfg = Config(dataset_name="synthetic", model_name="vae",
                 prior="standard", hidden_size=16, z1_size=4,
                 training_set_size=64, val_set_size=16, test_set_size=16,
                 batch_size=16, epochs=1,
                 snapshot_dir=str(tmp_path / "snap"))
    exp = Experiment(cfg, verbose=False)
    exp.train_epoch()
    exp.save_checkpoint("final")
    moved = str(tmp_path / "elsewhere" / "run")
    shutil.move(exp.exp_dir, moved)

    got = load_experiment(moved)
    assert got.epoch == 1
    for a, b in zip(jax.tree.leaves(exp.state.params),
                    jax.tree.leaves(got.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a dir with a config but no checkpoint must fail loudly
    import os
    bare = tmp_path / "bare"
    os.makedirs(bare)
    with open(bare / "config.json", "w") as f:
        f.write(cfg.to_json())
    with pytest.raises(FileNotFoundError, match="untrained"):
        load_experiment(str(bare))


def test_mlp_classifier_shapes():
    clf = MLPClassifier(n_classes=10, hidden=32)
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 28, 28, 1))
    v = clf.init(k, x)
    logits = clf.apply(v, x)
    assert logits.shape == (4, 10)
