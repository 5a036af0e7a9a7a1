"""2000-epoch sigma^2 watch in APPROXIMATE mode (round-4 VERDICT item 7).

DESIGN.md §4b measured the exact-mode encoder-runaway divergence (q_logvar
saturates at its -6 hardtanh, encoder means run away, fp32 overflow near
epoch ~215; every mitigation knob only shifts the onset — containment via
non-finite abort + best-on-val is the working answer). The flagship
APPROXIMATE-mode run was only 300 epochs with sigma^2 stable; this tool
extends that evidence to the reference's full 2000-epoch horizon at
config-1 scale (VAE, N=50k bank, K=10 kNN support, batch 100).

Early stopping is DISABLED (patience = epochs) so the run cannot end
before the horizon: the question is whether the objective's singularity
bites the approximate mode late, and an early-stopped run would leave the
tail unobserved. Containment (non-finite abort) stays armed — if the
divergence occurs, the run records its onset epoch instead of crashing.

Writes SIGMA_LONGRUN.json (per-epoch prior_log_var trace + summary).

    /opt/venv/bin/python tools/sigma_longrun.py [--epochs 2000]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--n", type=int, default=50_000)
    args = ap.parse_args()

    import numpy as np

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    cfg = Config(dataset_name="synthetic", model_name="vae",
                 prior="exemplar_prior", approximate_prior=True,
                 approximate_k=10, number_components=args.n,
                 training_set_size=args.n, val_set_size=1000,
                 test_set_size=1000, batch_size=100, warmup=100,
                 epochs=args.epochs, early_stopping_epochs=args.epochs,
                 S=128, MB=128, compute_dtype="bfloat16",
                 checkpoint_every=0, seed=14,
                 snapshot_dir=tempfile.mkdtemp(prefix="sigma_longrun_"))
    exp = Experiment(cfg, verbose=False)

    trace = []  # (epoch, prior_log_var, train_loss, val_loss)
    t0 = time.perf_counter()
    aborted = None

    def flush_json():
        # Written every 100 epochs so a truncated run still leaves evidence
        # (epochs_run < epochs_target marks a partial trace).
        lvs = [r[1] for r in trace if r[1] == r[1]]
        out = {"mode": "approximate", "k": cfg.approximate_k, "n": args.n,
               "epochs_run": len(trace), "epochs_target": args.epochs,
               "aborted_non_finite_at": aborted,
               "prior_log_var_first": lvs[0] if lvs else None,
               "prior_log_var_last": lvs[-1] if lvs else None,
               "prior_log_var_min": min(lvs) if lvs else None,
               "prior_log_var_max": max(lvs) if lvs else None,
               "best_val": exp.best_val,
               "wall_seconds": round(time.perf_counter() - t0, 1),
               "trace_every_10": trace[::10]}
        with open(_os.path.join(ROOT, "SIGMA_LONGRUN.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        return out

    while exp.epoch < args.epochs:
        m = exp.train_epoch()
        val_loss, _, _ = exp.validate()
        lv = m.get("prior_log_var", float("nan"))
        trace.append([exp.epoch, round(float(lv), 5),
                      round(float(m["loss"]), 3), round(float(val_loss), 3)])
        if not (np.isfinite(m["loss"]) and np.isfinite(val_loss)):
            aborted = exp.epoch  # containment: record onset, stop
            break
        if float(val_loss) < exp.best_val:
            exp.best_val = float(val_loss)
        if exp.epoch % 100 == 0 or exp.epoch <= 3:
            flush_json()
            print(f"epoch {exp.epoch:5d}  sigma2_logvar={lv:+.4f}  "
                  f"loss={m['loss']:.3f}  val={float(val_loss):.3f}  "
                  f"(+{time.perf_counter() - t0:.0f}s)", flush=True)

    out = flush_json()
    print(json.dumps({k: v for k, v in out.items() if k != "trace_every_10"}),
          flush=True)


if __name__ == "__main__":
    main()
