"""AOT memory analysis of the config-4 (N=200k CelebA-shaped) epoch program.

The full config-4 epoch has faulted the tunneled TPU worker three times on
2026-08-19 (DESIGN.md §8g). This tool tests the OOM hypothesis WITHOUT
executing anything: it builds the Experiment, AOT-lowers + compiles the
epoch program (both gather paths) and the cache refresh, and prints XLA's
own memory_analysis (argument/output/temp bytes) next to the persistent
live-array footprint. If peak = persistent + temp exceeds the chip's
16 GB, the "environment-correlated" worker crashes are in fact memory
exhaustion surfacing as a worker fault instead of RESOURCE_EXHAUSTED.

    /opt/venv/bin/python tools/analyze_hbm_cfg4.py [--n 200000] [--gather auto|in_scan|pregather]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import tempfile

GB = 2.0 ** 30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--gather", default=None,
                    choices=["auto", "in_scan", "pregather"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    kw = dict(model_name="convhvae_2level", prior="exemplar_prior",
              approximate_prior=True, approximate_k=10,
              number_components=args.n, training_set_size=args.n,
              dataset_name="synthetic_continuous", val_set_size=256,
              test_set_size=256, batch_size=100, warmup=100, S=2, MB=2,
              compute_dtype="bfloat16", exact_reencode_chunk=4096,
              snapshot_dir=tempfile.mkdtemp(prefix="hbm_aot_"))
    if args.gather:
        kw["gather_in_scan"] = args.gather
    cfg = Config(**kw)
    exp = Experiment(cfg, verbose=False)
    persistent = sum(a.nbytes for a in jax.live_arrays()) / GB
    print(f"persistent live arrays after setup: {persistent:.2f} GB", flush=True)

    report = {"n": args.n, "gather": cfg.gather_in_scan,
              "persistent_gb": round(persistent, 2)}

    def analyze(label, lowered):
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        row = {}
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                row[k.replace("_in_bytes", "_gb")] = round(v / GB, 3)
        print(label, row, flush=True)
        report[label] = row
        return row

    # cache refresh (runs first each epoch)
    ck = jax.random.fold_in(exp.key, 11)
    analyze("cache_refresh", exp.cache_refresh.lower(
        exp.state.params, exp.bank.images, ck))

    # epoch program at the configured gather path
    perm = exp._epoch_build(jax.random.fold_in(exp.key, 2),
                            steps=exp.steps_per_epoch, batch=cfg.batch_size)
    row = analyze("epoch_fn", exp.epoch_fn.lower(
        exp.state, exp.train_x, exp.train_idx, perm, exp.bank,
        jax.random.fold_in(exp.key, 3), jnp.float32(1.0)))

    temp = row.get("temp_size_gb", 0.0)
    # epoch_fn donates the TrainState, so its argument buffers are reused in
    # place; peak ~= persistent + temp (arguments are the live arrays).
    peak = persistent + temp
    report["peak_gb_estimate"] = round(peak, 2)
    print(f"peak estimate (persistent + epoch temp): {peak:.2f} GB "
          f"of 16 GB HBM", flush=True)

    out = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), f"HBM_AOT_{args.n}_{cfg.gather_in_scan}.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
