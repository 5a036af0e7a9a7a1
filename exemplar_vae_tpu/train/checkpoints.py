"""Full train-state checkpoint / resume.

The reference only saves the best model weights (torch.save(state_dict)) and
cannot resume a run (SURVEY.md §5). Here the whole training state persists:
params, optimizer moments, epoch, early-stopping bookkeeping, best-on-val
params, and the exemplar cache — a crash resumes bit-compatibly (the PRNG is
re-derived from cfg.seed + epoch, so no key state needs saving).

Format: one .npz of pytree leaves (insertion-ordered) + a meta json. Plain
numpy is deliberate — it has no cross-version API churn and the restore
target's treedef comes from freshly-initialized state of the same Config.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from exemplar_vae_tpu.train.steps import TrainState


def _save_tree(path, tree):
    leaves = jax.tree.leaves(jax.device_get(tree))
    tmp = path + ".tmp.npz"
    np.savez(tmp, *[np.asarray(l) for l in leaves])
    os.replace(tmp, path)  # atomic: a crash mid-save never corrupts the old file


def _load_tree(path, template):
    data = np.load(path)
    leaves = [data[k] for k in data.files]
    treedef = jax.tree.structure(template)
    t_leaves = jax.tree.leaves(template)
    assert len(leaves) == len(t_leaves), "checkpoint/config structure mismatch"
    leaves = [np.asarray(l).reshape(np.shape(t)).astype(np.asarray(t).dtype)
              for l, t in zip(leaves, t_leaves)]
    return jax.tree.unflatten(treedef, leaves)


def save_checkpoint(exp, tag: str = "last"):
    d = os.path.join(exp.exp_dir, f"ckpt_{tag}")
    os.makedirs(d, exist_ok=True)
    _save_tree(os.path.join(d, "state.npz"), exp.state)
    _save_tree(os.path.join(d, "best_params.npz"), exp.best_params)
    if exp.bank is not None and exp.bank.cache_means is not None:
        tmp = os.path.join(d, "cache.npz.tmp.npz")
        np.savez(tmp, cache=np.asarray(jax.device_get(exp.bank.cache_means)))
        os.replace(tmp, os.path.join(d, "cache.npz"))
    meta = {"epoch": exp.epoch, "best_val": exp.best_val,
            "bad_epochs": exp.bad_epochs}
    tmp = os.path.join(d, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(d, "meta.json"))


def restore_checkpoint(exp, tag: str = "last") -> bool:
    d = os.path.join(exp.exp_dir, f"ckpt_{tag}")
    meta_p = os.path.join(d, "meta.json")
    if not os.path.exists(meta_p):
        return False
    with open(meta_p) as f:
        meta = json.load(f)
    exp.state = _load_tree(os.path.join(d, "state.npz"), exp.state)
    exp.best_params = _load_tree(os.path.join(d, "best_params.npz"),
                                 exp.best_params)
    cache_p = os.path.join(d, "cache.npz")
    if exp.bank is not None and os.path.exists(cache_p):
        exp.bank = exp.bank._replace(
            cache_means=np.load(cache_p)["cache"])
    exp.epoch = int(meta["epoch"])
    exp.best_val = float(meta["best_val"])
    exp.bad_epochs = int(meta["bad_epochs"])
    return True
