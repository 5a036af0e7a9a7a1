"""CLI entry point, flag-compatible with the reference's main.py [U].

    python main.py --dataset_name dynamic_mnist --model_name vae \
        --prior exemplar_prior --number_components 25000

See exemplar_vae_tpu/config.py for the full flag list (reference flags plus
TPU-native extras like --mesh and --compute_dtype).
"""

from __future__ import annotations

import json


def main(argv=None):
    from exemplar_vae_tpu.config import config_from_args, reference_arg_parser
    ns = reference_arg_parser().parse_args(argv)
    cfg = config_from_args(ns)

    from exemplar_vae_tpu.train.trainer import Experiment
    exp = Experiment(cfg)
    if cfg.eval_only:
        # score an existing run without training: restore (preferring the
        # final checkpoint — its best_params drove the reported numbers),
        # then run the full final evaluation (IWAE at cfg.S + artifacts)
        for tag in ("final", "last"):
            if exp.restore_checkpoint(tag):
                print(f"eval_only: restored ckpt_{tag} (epoch {exp.epoch})")
                break
        else:
            raise SystemExit(
                f"--eval_only: no restorable checkpoint (ckpt_final or "
                f"ckpt_last) under {exp.exp_dir}")
        print(f"experiment dir: {exp.exp_dir}")
        results = exp.final_evaluation()
        print(json.dumps(results))
        return results
    if cfg.resume:
        if exp.restore_checkpoint():
            print(f"resumed from epoch {exp.epoch}")
        else:
            print(f"WARNING: --resume given but no checkpoint found under "
                  f"{exp.exp_dir}/ckpt_last — starting fresh")
    print(f"experiment dir: {exp.exp_dir}")
    print(f"dataset={cfg.dataset_name} source={exp.splits.source} "
          f"n_train={exp.n_train} mesh={exp.mesh.shape}")
    results = exp.run()
    exp.save_checkpoint("final")
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
