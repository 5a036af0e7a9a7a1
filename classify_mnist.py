"""Exemplar-VAE generative data augmentation experiment
(reference: classify_mnist.py [name L, mechanism H]; SURVEY.md §3.4).

Trains an MLP classifier twice — plain, and with per-example stochastic
replacement by exemplar-conditioned VAE samples — and reports both test
errors.

    python classify_mnist.py --vae_dir snapshots/<experiment> --pi 0.5
    python classify_mnist.py --train_first   # small VAE first, then classify
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--vae_dir", type=str, default=None,
                   help="snapshot dir of a trained (exemplar) VAE")
    p.add_argument("--train_first", action="store_true",
                   help="train a small exemplar VAE first (no --vae_dir)")
    p.add_argument("--pi", type=float, default=0.5,
                   help="per-example replacement probability")
    p.add_argument("--classifier_epochs", type=int, default=30)
    p.add_argument("--label_budget", type=int, default=0,
                   help="subsample the labeled set to this many examples "
                        "(0 = all); augmentation matters most when labels "
                        "are scarce")
    p.add_argument("--classifier_lr", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    # flags for --train_first mode
    p.add_argument("--dataset_name", type=str, default="dynamic_mnist")
    p.add_argument("--vae_epochs", type=int, default=20)
    p.add_argument("--training_set_size", type=int, default=50_000)
    p.add_argument("--S", type=int, default=16,
                   help="IWAE samples for the VAE's final eval in --train_first mode")
    ns = p.parse_args(argv)

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.augment import load_experiment, train_classifier
    from exemplar_vae_tpu.train.trainer import Experiment

    if ns.vae_dir:
        exp = load_experiment(ns.vae_dir)
    elif ns.train_first:
        cfg = Config(dataset_name=ns.dataset_name, model_name="vae",
                     prior="exemplar_prior", epochs=ns.vae_epochs,
                     warmup=min(10, ns.vae_epochs), S=ns.S, MB=ns.S,
                     training_set_size=ns.training_set_size,
                     number_components=ns.training_set_size,
                     seed=ns.seed)
        exp = Experiment(cfg)
        exp.run()
        exp.save_checkpoint("final")
    else:
        raise SystemExit("need --vae_dir or --train_first")

    params = exp.best_params
    results = {}
    for name, aug in [("plain", False), ("exemplar_augmented", True)]:
        r = train_classifier(exp.model, params, exp.cfg, exp.splits,
                             pi=ns.pi, epochs=ns.classifier_epochs,
                             lr=ns.classifier_lr, batch_size=ns.batch_size,
                             seed=ns.seed, augment=aug,
                             label_budget=ns.label_budget, verbose=False)
        results[name] = {"test_error": r.test_error,
                         "train_seconds": r.train_seconds}
        print(f"{name}: test error {100 * r.test_error:.2f}% "
              f"({r.train_seconds:.1f}s)")
    out = json.dumps(results)
    with open(f"{exp.exp_dir}/classifier_results.json", "w") as f:
        f.write(out)
    print(out)
    return results


if __name__ == "__main__":
    main()
