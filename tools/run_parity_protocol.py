"""One-command runner for the real-data NLL parity protocol (PR8 of
SURVEY.md §7.2 — the binding 0.1-nat target of BASELINE.json's north_star).

The protocol has been blocked since round 1 on an environmental fact: the
image has no dataset files and the reference mount is empty (BASELINE.md
provenance caveat). This runner makes the unblocking a single command: the
moment datasets appear under --data_dir (and/or the mount populates), run

    python tools/run_parity_protocol.py                # all configs
    python tools/run_parity_protocol.py --configs 1,3  # subset
    python tools/run_parity_protocol.py --dry          # readiness report only

and it executes BASELINE.json's five configs at the paper protocol
(epochs 2000 / warmup 100 / early-stop 50 / batch 100 / IWAE S=5000 with
the full exemplar bank at eval), writes parity_report.json with per-config
NLLs and deltas against the re-pulled paper targets, and runs the
augmentation classifier against the config-1 snapshot.

Guard rails:
* refuses to report "parity" numbers from synthetic fallbacks — a config
  whose loader fell back (DataSplits.source != 'real') is marked blocked
  unless --smoke (the CI mode, tests/test_parity_protocol.py);
* prints the session-0 verification checklist (the [U]-flagged conventions
  of docs/DESIGN.md §4 that MUST be checked against the reference before
  trusting any delta) whenever the mount is populated;
* PAPER_TARGETS ships as None — BASELINE.md's recalled values are
  explicitly NOT trustworthy targets (marked [recalled]); re-pull
  arXiv:2004.04795 Table 1 and fill them in before a parity claim.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_MOUNT = "/root/reference"

# BASELINE.json "configs", expanded to concrete Config kwargs. Session-0
# items that could change these: conv_enc/dec_spec channel counts [M],
# approximate_support per_row vs batch_union (measured ~2.4 nats apart —
# DESIGN.md §5), eval binarization placement (DESIGN.md §4).
PROTOCOL = {
    "1": dict(label="VAE + dynamic MNIST, full exact exemplar prior",
              cfg=dict(dataset_name="dynamic_mnist", model_name="vae",
                       prior="exemplar_prior")),
    "2a": dict(label="HVAE_2level + static MNIST, full exact exemplar prior",
               cfg=dict(dataset_name="static_mnist", model_name="hvae_2level",
                        prior="exemplar_prior")),
    "2b": dict(label="HVAE_2level + Omniglot, full exact exemplar prior",
               cfg=dict(dataset_name="omniglot", model_name="hvae_2level",
                        prior="exemplar_prior")),
    "3": dict(label="ConvHVAE_2level + Fashion-MNIST, approximate-kNN K=10",
              cfg=dict(dataset_name="fashion_mnist",
                       model_name="convhvae_2level", prior="exemplar_prior",
                       approximate_prior=True, approximate_k=10)),
    # training mode is approximate-kNN (the paper's large-data mode, §3.2);
    # EVAL is always the full-bank exact prior. Whether the reference's
    # CelebA TRAINING runs exact or approximate is a session-0 checklist
    # item — if it trains exact, drop the two approximate_* keys here.
    "4": dict(label="ConvHVAE_2level + CelebA, continuous, approximate-kNN "
                    "K=10 training / full-bank exact eval (sharded-capable)",
              cfg=dict(dataset_name="celeba", model_name="convhvae_2level",
                       prior="exemplar_prior", approximate_prior=True,
                       approximate_k=10)),
    "5": dict(label="MNIST classifier + exemplar augmentation "
                    "(uses config 1's snapshot)"),
}

# nats (configs 1-4) / test-error % (config 5). None = not re-pulled yet;
# deltas are only computed for filled-in cells. Do NOT copy BASELINE.md's
# [recalled] values here — re-pull from arXiv:2004.04795 Table 1 first.
PAPER_TARGETS = {"1": None, "2a": None, "2b": None, "3": None, "4": None,
                 "5": None}

SESSION0_CHECKLIST = [
    "EVAL_BIN_SEED placement: val/test binarized once at load (DESIGN.md §4)",
    "approximate_support: per_row vs batch_union in get_exemplar_set "
    "(DESIGN.md §5 — measured ~2.4 nats apart)",
    "ConvHVAE conv_enc_spec/conv_dec_spec channel+kernel counts "
    "(config-driven; correct via flags, not code)",
    "Omniglot column-major reshape (data/loaders.py)",
    "prior variance init / learned-sigma^2 conventions "
    "(prior_variance_init, clamp bounds)",
    "number_components: full train set vs a subset in the paper runs",
    "CelebA TRAINING prior mode: approximate-kNN (paper large-data mode, "
    "assumed here) vs exact full-bank — flip PROTOCOL['4'] if exact",
    "deterministic validation key (DESIGN.md §4 — deliberate deviation: our "
    "val/IWAE z-draws use one fixed per-run key; the reference's advance "
    "the global RNG per eval, changing early-stopping dynamics; fallback = "
    "fold_in(seed, epoch) per-epoch keys in trainer.validate())",
]


def readiness(data_dir: str):
    """What is unblocked? -> dict per config + mount status."""
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.data.loaders import load_dataset

    mount_files = []
    if os.path.isdir(REFERENCE_MOUNT):
        for root, _, files in os.walk(REFERENCE_MOUNT):
            mount_files += [os.path.join(root, f) for f in files]
    status = {"reference_mount_files": len(mount_files),
              "session0_checklist": SESSION0_CHECKLIST, "configs": {}}
    for key, spec in PROTOCOL.items():
        if "cfg" not in spec:
            status["configs"][key] = {"data": "inherits config 1"}
            continue
        cfg = Config(data_dir=data_dir, training_set_size=64,
                     val_set_size=16, test_set_size=16, **spec["cfg"])
        try:
            splits, _ = load_dataset(cfg)
            status["configs"][key] = {"data": splits.source}
        except Exception as e:  # a malformed real file must not hide others
            status["configs"][key] = {"data": f"error: {e}"}
    return status


def build_config(key: str, ns) -> "Config":
    from exemplar_vae_tpu.config import Config
    spec = dict(PROTOCOL[key]["cfg"])
    # paper protocol defaults (SURVEY.md §0.1/§0.4); Config already
    # carries lr=5e-4, batch=100, epochs=2000, warmup=100, patience=50,
    # S=5000 — only the run-scale knobs are set here.
    kw = dict(snapshot_dir=ns.snapshot_dir, data_dir=ns.data_dir,
              seed=ns.seed, checkpoint_every=25, resume=True)
    if ns.mesh > 1:
        kw["mesh_shape"] = (ns.mesh,)
    if ns.smoke:
        kw.update(training_set_size=ns.smoke_n, val_set_size=32,
                  test_set_size=32, number_components=ns.smoke_n,
                  epochs=2, warmup=1, S=4, MB=4, hidden_size=32,
                  batch_size=32, early_stopping_epochs=2,
                  conv_proj_channels=8,
                  conv_enc_spec="8k3s1,8k3s2", conv_dec_spec="t8k3s2,8k3s1")
    else:
        if ns.max_epochs:
            kw["epochs"] = ns.max_epochs
        if ns.S:
            kw.update(S=ns.S, MB=min(500, ns.S))
    cfg = Config(**spec, **kw)
    if not ns.smoke and cfg.number_components < cfg.training_set_size:
        # full exemplar prior = whole training set as the bank
        cfg = cfg.replace(number_components=cfg.training_set_size)
    return cfg


def run_model_config(key: str, ns) -> dict:
    from exemplar_vae_tpu.train.trainer import Experiment
    cfg = build_config(key, ns)
    exp = Experiment(cfg, verbose=not ns.smoke)
    row = {"label": PROTOCOL[key]["label"], "experiment_dir": exp.exp_dir,
           "data_source": exp.splits.source}
    if exp.splits.source != "real" and not (ns.smoke or ns.allow_synthetic):
        row["status"] = "blocked: loader fell back to synthetic data"
        return row
    results = exp.run()
    exp.save_checkpoint("final")
    row.update(status="ran", test_nll=results["test_nll"],
               best_val_loss=results["best_val_loss"],
               epochs_trained=results["epochs_trained"])
    target = PAPER_TARGETS.get(key)
    if target is not None:
        row["paper_nll"] = target
        row["delta_nats"] = results["test_nll"] - target
        row["within_0.1_nats"] = abs(row["delta_nats"]) <= 0.1
    return row


def run_classifier_config(ns, report) -> dict:
    from exemplar_vae_tpu.train.augment import load_experiment, train_classifier
    row = {"label": PROTOCOL["5"]["label"]}
    vae_row = report["configs"].get("1")
    if not vae_row or vae_row.get("status") != "ran":
        row["status"] = "blocked: config 1 did not run (classifier needs "\
                        "its snapshot)"
        return row
    exp = load_experiment(vae_row["experiment_dir"])
    epochs = 2 if ns.smoke else 30
    for name, aug in (("plain", False), ("exemplar_augmented", True)):
        r = train_classifier(exp.model, exp.best_params, exp.cfg, exp.splits,
                             pi=0.5, epochs=epochs, seed=ns.seed,
                             augment=aug, verbose=False)
        row[name + "_test_error"] = r.test_error
    row["status"] = "ran"
    target = PAPER_TARGETS.get("5")
    if target is not None:
        row["paper_test_error_pct"] = target
        row["delta_pct"] = 100 * row["exemplar_augmented_test_error"] - target
    return row


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--configs", type=str, default="1,2a,2b,3,4,5")
    p.add_argument("--data_dir", type=str, default="datasets")
    p.add_argument("--snapshot_dir", type=str, default="snapshots/parity")
    p.add_argument("--out", type=str, default="parity_report.json")
    p.add_argument("--max_epochs", type=int, default=0,
                   help="override the paper's 2000-epoch cap")
    p.add_argument("--S", type=int, default=0, help="override IWAE S=5000")
    p.add_argument("--mesh", type=int, default=1)
    p.add_argument("--seed", type=int, default=14)
    p.add_argument("--dry", action="store_true",
                   help="readiness report only, run nothing")
    p.add_argument("--smoke", action="store_true",
                   help="tiny synthetic end-to-end (CI: the runner itself)")
    p.add_argument("--smoke_n", type=int, default=128)
    p.add_argument("--allow_synthetic", action="store_true",
                   help="run on synthetic fallbacks anyway (NOT a parity run)")
    ns = p.parse_args(argv)

    ready = readiness(ns.data_dir)
    # merge with an existing report so multi-day subset invocations
    # accumulate: `--configs 1` (days of training) then `--configs 5`
    # must find config 1's row on disk, and a crash mid-protocol must
    # not discard completed configs (the report is re-written after
    # EVERY config below)
    report = {"readiness": ready, "smoke": ns.smoke, "configs": {}}
    if os.path.exists(ns.out):
        try:
            with open(ns.out) as f:
                prev = json.load(f)
            if prev.get("smoke") == ns.smoke:
                report["configs"].update(prev.get("configs", {}))
        except (ValueError, OSError) as e:
            print(f"WARNING: existing {ns.out} unreadable ({e}); starting "
                  "a fresh report")
    if ready["reference_mount_files"]:
        print(f"reference mount HAS {ready['reference_mount_files']} files — "
              "run the session-0 checklist BEFORE trusting deltas:")
        for item in SESSION0_CHECKLIST:
            print("  [ ]", item)
    for key, st in ready["configs"].items():
        print(f"config {key}: data={st['data']}")
    if ns.dry:
        print(json.dumps(ready["configs"], indent=1))
        return report

    keys = [k.strip() for k in ns.configs.split(",") if k.strip()]
    unknown = [k for k in keys if k not in PROTOCOL]
    if unknown:
        raise SystemExit(f"unknown configs {unknown}; valid: {list(PROTOCOL)}")
    def _flush():
        tmp = ns.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1)
        os.replace(tmp, ns.out)

    for key in keys:
        if key == "5":
            continue  # after the model runs (needs config 1's snapshot)
        print(f"=== config {key}: {PROTOCOL[key]['label']}")
        try:
            report["configs"][key] = run_model_config(key, ns)
        except Exception as e:  # one failed config must not lose the rest
            report["configs"][key] = {"label": PROTOCOL[key]["label"],
                                      "status": f"error: {e!r}"}
        print(json.dumps(report["configs"][key], indent=1))
        _flush()
    if "5" in keys:
        print(f"=== config 5: {PROTOCOL['5']['label']}")
        report["configs"]["5"] = run_classifier_config(ns, report)
        print(json.dumps(report["configs"]["5"], indent=1))
        _flush()

    _flush()
    print("wrote", ns.out)
    return report


if __name__ == "__main__":
    main()
