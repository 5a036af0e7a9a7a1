"""Config-4 full-epoch execution campaign (round-4 VERDICT top item).

BASELINE.json config 4 — ConvHVAE on CelebA-shaped data, approximate
exemplar prior, N=200k — faulted the TPU worker at epoch EXECUTION in
every round-4 arm (6 reproductions; setup + compiles clean; XLA AOT says
13.35 GB peak of 16 — DESIGN.md §8g). This tool runs ONE arm end to end:
build the Experiment, run a FULL epoch (optionally split into
cfg.epoch_splits compiled scans — the §8g "next lever") plus validation,
and append a result row to CFG4_CAMPAIGN.json. Per-phase prints are
flushed so a worker crash leaves a diagnosable tail.

    /opt/venv/bin/python tools/run_cfg4_epoch.py --n 200000 --splits 4 \
        [--gather auto|in_scan|pregather] [--approx_remat] [--aot-only]

Run arms one at a time (single-tenant chip); on a worker fault, the row
is appended by the WRAPPER you run this under — this process dies.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time

GB = 2.0 ** 30
ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
OUT = _os.path.join(ROOT, "CFG4_CAMPAIGN.json")


def append_row(row):
    rows = []
    if _os.path.exists(OUT):
        with open(OUT) as fh:
            rows = json.load(fh)
    rows.append(row)
    tmp = OUT + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rows, fh, indent=1)
    _os.replace(tmp, OUT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--splits", type=int, default=0,
                    help="cfg.epoch_splits (0 = auto)")
    ap.add_argument("--gather", default="auto",
                    choices=["auto", "in_scan", "pregather"])
    ap.add_argument("--approx_remat", action="store_true")
    ap.add_argument("--aot-only", action="store_true",
                    help="AOT memory analysis only; skip execution")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.profiling import fetch_sync
    from exemplar_vae_tpu.train.trainer import Experiment

    row = {"n": args.n, "splits_requested": args.splits,
           "gather": args.gather, "approx_remat": args.approx_remat,
           "platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}
    t_start = time.perf_counter()

    print(f"[phase 0] building Experiment n={args.n} splits={args.splits} "
          f"gather={args.gather} remat={args.approx_remat}", flush=True)
    cfg = Config(model_name="convhvae_2level", prior="exemplar_prior",
                 approximate_prior=True, approximate_k=10,
                 number_components=args.n, training_set_size=args.n,
                 dataset_name="synthetic_continuous", val_set_size=256,
                 test_set_size=256, batch_size=100, warmup=100, S=2, MB=2,
                 compute_dtype="bfloat16", exact_reencode_chunk=4096,
                 gather_in_scan=args.gather, epoch_splits=args.splits,
                 approx_remat=args.approx_remat,
                 snapshot_dir=tempfile.mkdtemp(prefix="cfg4_"))
    exp = Experiment(cfg, verbose=False)
    persistent = sum(a.nbytes for a in jax.live_arrays()) / GB
    row.update(splits_effective=exp.epoch_splits,
               steps_per_epoch=exp.steps_per_epoch,
               persistent_gb=round(persistent, 2),
               gather_effective=cfg.gather_in_scan)
    print(f"[phase 1] setup done: persistent {persistent:.2f} GB, "
          f"{exp.steps_per_epoch} steps/epoch in {exp.epoch_splits} "
          f"scan(s) of {exp.steps_per_epoch // exp.epoch_splits}", flush=True)

    # AOT accounting of ONE chunk program (what actually executes)
    chunk = exp.steps_per_epoch // exp.epoch_splits
    perm = exp._epoch_build(jax.random.fold_in(exp.key, 2),
                            steps=exp.steps_per_epoch, batch=cfg.batch_size)
    lowered = exp.epoch_fn.lower(
        exp.state, exp.train_x, exp.train_idx, perm[:chunk], exp.bank,
        jax.random.fold_in(exp.key, 3), jnp.float32(1.0), jnp.int32(0))
    ma = lowered.compile().memory_analysis()
    if ma is not None:
        row["chunk_temp_gb"] = round(ma.temp_size_in_bytes / GB, 2)
        row["chunk_peak_gb_estimate"] = round(
            persistent + ma.temp_size_in_bytes / GB, 2)
    print(f"[phase 2] chunk program AOT: temp "
          f"{row.get('chunk_temp_gb')} GB, peak estimate "
          f"{row.get('chunk_peak_gb_estimate')} GB of 16", flush=True)
    del lowered
    if args.aot_only:
        row["aot_only"] = True
        append_row(row)
        print("aot-only: row appended, skipping execution", flush=True)
        return

    t0 = time.perf_counter()
    m = exp.train_epoch()
    fetch_sync(exp.state.params["prior_log_var"])
    t_epoch = time.perf_counter() - t0
    row.update(epoch_seconds=round(t_epoch, 1),
               loss=float(m["loss"]),
               images_per_sec=round(m["images_per_sec"], 1))
    print(f"[phase 3] FULL EPOCH OK in {t_epoch:.1f}s "
          f"(loss={m['loss']:.3f}, {m['images_per_sec']:.0f} img/s incl. "
          f"compile)", flush=True)

    t0 = time.perf_counter()
    val_loss, val_re, val_kl = exp.validate()
    row.update(val_seconds=round(time.perf_counter() - t0, 1),
               val_loss=float(val_loss))
    print(f"[phase 4] VALIDATE OK: val_loss={float(val_loss):.3f}", flush=True)

    # a second epoch isolates steady-state step time from compile
    t0 = time.perf_counter()
    m2 = exp.train_epoch()
    fetch_sync(exp.state.params["prior_log_var"])
    t2 = time.perf_counter() - t0
    row.update(epoch2_seconds=round(t2, 1),
               epoch2_images_per_sec=round(m2["images_per_sec"], 1),
               ok=True, total_seconds=round(time.perf_counter() - t_start, 1))
    print(f"[phase 5] SECOND EPOCH OK in {t2:.1f}s "
          f"({m2['images_per_sec']:.0f} img/s steady)", flush=True)
    append_row(row)
    print(f"row appended to {OUT}: {json.dumps(row)}", flush=True)


if __name__ == "__main__":
    main()
