"""Measured per-config HBM posture (round-3 VERDICT weak #3).

Round 3 held ~3x the dataset in HBM per chip: train_x replicated + the
fully-materialized permuted epoch tensor + a separate exemplar-bank copy.
Round 4 removed two of the three copies (in-scan batch gather in
steps.make_epoch_fn; bank aliased to train_x when number_components covers
the train set). This tool measures the surviving posture on the real chip.

The axon plugin's device.memory_stats() returns zeros, so two sources that
do work are used instead:
  * persistent posture — sum of live jax.Array bytes (the buffers that sit
    in HBM between steps: params, opt state, train_x, bank, caches);
  * per-epoch program footprint — the compiled epoch_fn's own
    memory_analysis() (XLA's argument/output/temp accounting, i.e. the
    transient working set the scan needs on top of the persistent arrays).

    /opt/venv/bin/python tools/measure_hbm.py [--fast]

Writes HBM_POSTURE.json at the repo root (rows for docs/DESIGN.md §8f).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import tempfile

MB = 2.0 ** 20


def live_mb():
    import jax
    return sum(a.nbytes for a in jax.live_arrays()) / MB


def measure(label, cfg_kw):
    import gc

    import jax

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    gc.collect()
    base = live_mb()
    cfg = Config(snapshot_dir=tempfile.mkdtemp(prefix="hbm_"), **cfg_kw)
    exp = Experiment(cfg, verbose=False)
    ds_mb = exp.splits.train_x.nbytes / MB
    after_setup = live_mb()
    exp.train_epoch()
    exp.validate()
    gc.collect()
    after_epoch = live_mb()

    # XLA's own accounting for the compiled epoch program
    perm = exp._epoch_build(jax.random.fold_in(exp.key, 2),
                            steps=exp.steps_per_epoch,
                            batch=cfg.batch_size)
    lowered = exp.epoch_fn.lower(exp.state, exp.train_x, exp.train_idx,
                                 perm, exp.bank,
                                 jax.random.fold_in(exp.key, 3),
                                 jax.numpy.float32(1.0))
    ma = lowered.compile().memory_analysis()
    analysis = {}
    if ma is not None:
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                analysis[k.replace("_in_bytes", "_mb")] = round(v / MB, 1)

    row = {"config": label,
           "dataset_mb": round(ds_mb, 1),
           "persistent_after_setup_mb": round(after_setup - base, 1),
           "persistent_after_epoch_mb": round(after_epoch - base, 1),
           "persistent_over_dataset": round((after_epoch - base) / ds_mb, 2),
           "epoch_fn": analysis,
           "n_train": exp.n_train,
           "dtype": str(exp.splits.train_x.dtype)}
    print(row, flush=True)
    del exp
    gc.collect()
    return row


def main():
    fast = "--fast" in _sys.argv
    n50 = 5_000 if fast else 50_000
    n200 = 20_000 if fast else 200_000
    common = dict(dataset_name="synthetic", val_set_size=256,
                  test_set_size=256, batch_size=100, warmup=100, S=2, MB=2,
                  compute_dtype="bfloat16", exact_reencode_chunk=0)
    configs = [
        ("1: VAE MNIST-shaped, exact N=50k",
         dict(model_name="vae", prior="exemplar_prior",
              number_components=n50, training_set_size=n50, **common)),
        ("2: HVAE MNIST-shaped, exact N=50k",
         dict(model_name="hvae_2level", prior="exemplar_prior",
              number_components=n50, training_set_size=n50, **common)),
        ("3: ConvHVAE Fashion-shaped (gray), approx K=10 N=50k",
         dict(model_name="convhvae_2level", prior="exemplar_prior",
              approximate_prior=True, approximate_k=10,
              number_components=n50, training_set_size=n50,
              dataset_name="synthetic_gray",
              **{k: v for k, v in common.items() if k != "dataset_name"})),
        ("4: ConvHVAE CelebA-shaped (3x64x64 uint8 continuous), approx "
         "K=10 N=200k",
         dict(model_name="convhvae_2level", prior="exemplar_prior",
              approximate_prior=True, approximate_k=10,
              number_components=n200, training_set_size=n200,
              dataset_name="synthetic_continuous",
              **{k: v for k, v in common.items()
                 if k not in ("dataset_name", "exact_reencode_chunk")},
              exact_reencode_chunk=4096)),
    ]
    rows = []
    for label, kw in configs:
        try:
            rows.append(measure(label, kw))
        except Exception as e:  # record per-config failures, keep going
            rows.append({"config": label, "error": repr(e)[:300]})
            print(rows[-1], flush=True)
    out = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "HBM_POSTURE.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
