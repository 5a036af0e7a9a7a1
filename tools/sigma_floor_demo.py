"""Mitigation arms for the known-diverging synthetic config (DESIGN §4b).

docs/DESIGN.md §4b documents a bitwise-deterministic divergence of the
objective+optimizer on synthetic data: VAE, exact exemplar prior, N=50k,
batch 100, lr 5e-4 — training blows up to NaN around epoch ~215 (the
trainer's non-finite abort then stops the run). Round-2 VERDICT weak #3
asked for a knob that lets such a run FINISH.

Each arm runs the config on the real chip with one candidate knob; an arm
"survives" if it gets past the baseline's abort epoch with finite losses
(see ARMS below for the measured outcomes — the first two candidate knobs
are measured INSUFFICIENT, which is itself the §4b finding: the objective
has a GMM-style likelihood singularity on near-duplicate exemplars).

Writes/merges sigma_floor_demo.json at the repo root. Usage:
    /opt/venv/bin/python tools/sigma_floor_demo.py [--epochs 240]
        [--arm no_floor|floor_005|q_floor_m4|adam]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(var_min: float, max_epochs: int, q_logvar_min: float = -6.0,
            optimizer: str = "adam_norm_grad"):
    import jax

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    cfg = Config(dataset_name="synthetic", model_name="vae",
                 prior="exemplar_prior", number_components=50_000,
                 training_set_size=50_000, val_set_size=2_000,
                 test_set_size=1_000, batch_size=100, test_batch_size=1_000,
                 warmup=100, epochs=max_epochs,
                 early_stopping_epochs=max_epochs + 1,
                 S=8, MB=8, seed=14, compute_dtype="bfloat16",
                 prior_var_min=var_min, q_logvar_min=q_logvar_min,
                 optimizer=optimizer,
                 snapshot_dir=tempfile.mkdtemp(prefix="sigma_demo_"))
    exp = Experiment(cfg, verbose=False)
    history = []
    aborted = None
    while exp.epoch < max_epochs:
        m = exp.train_epoch()
        val_loss, _, _ = exp.validate()
        rec = {"epoch": exp.epoch, "loss": m["loss"],
               "val": float(val_loss),
               "prior_log_var": m.get("prior_log_var")}
        history.append(rec)
        if exp.epoch % 10 == 0 or exp.epoch > 195:
            print(f"  var_min={var_min} epoch {exp.epoch}: "
                  f"loss={m['loss']:.2f} val={float(val_loss):.2f} "
                  f"plv={m.get('prior_log_var'):.3f}", flush=True)
        finite = (m["loss"] == m["loss"]) and (val_loss == val_loss)
        if not finite:
            aborted = exp.epoch
            print(f"  var_min={var_min}: NON-FINITE at epoch {exp.epoch}",
                  flush=True)
            break
    return {"prior_var_min": var_min, "aborted_epoch": aborted,
            "epochs_completed": exp.epoch if aborted is None else aborted - 1,
            "tail": history[-8:]}


ARMS = {
    # arm -> (prior_var_min, q_logvar_min, optimizer)
    "no_floor": (0.0, -6.0, "adam_norm_grad"),   # baseline: ~215 abort
    "floor_005": (0.05, -6.0, "adam_norm_grad"), # round-2 hypothesis knob —
                                  # MEASURED INSUFFICIENT (NaN at 217 with
                                  # the floor binding)
    "q_floor_m4": (0.0, -4.0, "adam_norm_grad"), # posterior-noise knob —
                                  # ALSO INSUFFICIENT (NaN at 188; prior
                                  # sigma^2 equilibrates lower and the same
                                  # runaway fires): the objective itself is
                                  # unbounded here (GMM-style likelihood
                                  # singularity on near-duplicate exemplars)
    "adam": (0.0, -6.0, "adam"),  # optimizer ablation — delays the abort to
                                  # 238 (vs 215) but the same plv plunge +
                                  # NaN signature fires: the runaway is not
                                  # specific to AdamNormGrad's normalization
    "combined": (0.05, -4.0, "adam_norm_grad"),  # both floors together —
                                  # ALSO INSUFFICIENT (NaN at 223): blocking
                                  # the sigma^2 direction reroutes the
                                  # instability through the encoder-mean
                                  # runaway. Full conclusion in DESIGN §4b:
                                  # every knob shifts the onset, none
                                  # prevents it; containment is the cure.
}


def main():
    max_epochs = 240
    if "--epochs" in sys.argv:
        max_epochs = int(sys.argv[sys.argv.index("--epochs") + 1])
    only = (sys.argv[sys.argv.index("--arm") + 1]
            if "--arm" in sys.argv else None)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "sigma_floor_demo.json")
    out = {}
    if only and os.path.exists(path):
        with open(path) as f:
            out = json.load(f)   # merge a single arm into prior results
    for arm, (vm, qm, opt) in ARMS.items():
        if only and arm != only:
            continue
        print(f"arm {arm}: prior_var_min={vm} q_logvar_min={qm} opt={opt}",
              flush=True)
        out[arm] = run_arm(vm, max_epochs, q_logvar_min=qm, optimizer=opt)
    a = out.get("no_floor")
    survivors = [arm for arm in ARMS
                 if arm != "no_floor" and arm in out
                 and out[arm]["aborted_epoch"] is None
                 and a and a["aborted_epoch"] is not None
                 and out[arm]["epochs_completed"] > a["aborted_epoch"]]
    out["demonstrated"] = bool(survivors)
    out["surviving_arms"] = survivors
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({arm: out[arm]["aborted_epoch"]
                      for arm in ARMS if arm in out}
                     | {"demonstrated": out["demonstrated"]}, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
