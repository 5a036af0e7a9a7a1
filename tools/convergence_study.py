"""Convergence study: train the full 3-models x 3-priors matrix and record
final IWAE NLLs (synthetic data at MNIST shapes — the image has no real
datasets). Validates every model/prior code path end-to-end and checks the
paper's qualitative ordering (exemplar prior should not be worse than the
standard Gaussian once warmed up).

    /opt/venv/bin/python tools/convergence_study.py [--epochs 20]
Writes RESULTS.md + results_matrix.json at the repo root.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time


def run_one(model_name, prior, epochs, n):
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    cfg = Config(
        dataset_name="synthetic", model_name=model_name, prior=prior,
        number_components=(500 if prior == "vampprior" else n),
        training_set_size=n, val_set_size=1000, test_set_size=1000,
        batch_size=100, warmup=max(epochs // 2, 1), epochs=epochs,
        early_stopping_epochs=epochs, S=128, MB=128,
        compute_dtype="bfloat16", exact_reencode_chunk=0, exact_remat=False,
        snapshot_dir="/tmp/convergence_snap", seed=14)
    t0 = time.perf_counter()
    exp = Experiment(cfg, verbose=False)
    res = exp.run()
    return {
        "model": model_name, "prior": prior,
        "test_nll": round(res["test_nll"], 2),
        "best_val_loss": round(res["best_val_loss"], 2),
        "epochs": res["epochs_trained"],
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--n", type=int, default=10_000)
    ns = p.parse_args(argv)
    rows = []
    for model in ("vae", "hvae_2level", "convhvae_2level",
                  "pixelhvae_2level"):
        for prior in ("standard", "vampprior", "exemplar_prior"):
            try:
                r = run_one(model, prior, ns.epochs, ns.n)
            except Exception as e:
                r = {"model": model, "prior": prior, "error": repr(e)[:200]}
            rows.append(r)
            print(json.dumps(r), flush=True)
    with open("results_matrix.json", "w") as f:
        json.dump(rows, f, indent=2)

    lines = [
        f"Synthetic data (MNIST shapes, N={ns.n} train / 1000 val / 1000 "
        f"test), {ns.epochs} epochs, warmup {max(ns.epochs // 2, 1)}, "
        "IWAE S=128, one TPU v5e chip, bf16 compute. Real-dataset numbers "
        "are blocked on data availability (no network; see BASELINE.md).",
        "",
        "| model | prior | test NLL (nats) | best val loss | wall s |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['model']} | {r['prior']} | ERROR {r['error']} | | |")
        else:
            lines.append(f"| {r['model']} | {r['prior']} | {r['test_nll']} "
                         f"| {r['best_val_loss']} | {r['wall_s']} |")
    table = "\n".join(lines)

    # splice ONLY the matrix section of RESULTS.md (between the markers) so
    # the trajectory-parity section and the reading notes survive re-runs
    start, end = "<!-- matrix:start -->", "<!-- matrix:end -->"
    if os.path.exists("RESULTS.md"):
        txt = open("RESULTS.md").read()
        if start in txt and end in txt:
            head, rest = txt.split(start, 1)
            _, tail = rest.split(end, 1)
            txt = head + start + "\n" + table + "\n" + end + tail
        else:
            txt += f"\n{start}\n{table}\n{end}\n"
        with open("RESULTS.md", "w") as f:
            f.write(txt)
        print("spliced matrix into RESULTS.md")
    else:
        with open("RESULTS.md", "w") as f:
            f.write(f"# RESULTS\n\n{start}\n{table}\n{end}\n")
        print("wrote RESULTS.md")


if __name__ == "__main__":
    main()
