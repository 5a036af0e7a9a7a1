"""Per-step diagnosis of the late-training divergence (docs/DESIGN.md §4b).

The sigma^2-floor demo (tools/sigma_floor_demo.py, sigma_floor_demo.json)
FALSIFIED the round-2 curvature hypothesis: with prior sigma^2 floored at
0.05 the run still blows up at epoch ~217 (vs 215 unfloored), with
prior_log_var pinned at the floor the whole time. Whatever diverges is not
(only) the prior variance.

This tool reproduces the diverging trajectory bitwise (same config, same
key folding as the compiled epoch scan) but runs the final epochs one step
at a time with rich diagnostics:

  * loss / RE / KL per step,
  * per-subtree gradient global-norms (which parameters explode first?),
  * encoder posterior stats (max |q_mean|, min/max q_logvar),
  * raw (pre-clamp) prior_log_var.

Writes sigma_collapse_diag.json. Usage:
    /opt/venv/bin/python tools/sigma_collapse_diag.py \
        [--from_epoch 205] [--to_epoch 220] [--var_min 0.0]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.loss import elbo_terms
    from exemplar_vae_tpu.train.steps import (TrainState, _preprocess_bank,
                                              make_train_step)
    from exemplar_vae_tpu.train.trainer import Experiment, beta_schedule
    from exemplar_vae_tpu.ops.preprocess import preprocess_batch

    def argval(flag, default, cast):
        return cast(sys.argv[sys.argv.index(flag) + 1]) \
            if flag in sys.argv else default

    from_epoch = argval("--from_epoch", 205, int)
    to_epoch = argval("--to_epoch", 220, int)
    var_min = argval("--var_min", 0.0, float)

    cfg = Config(dataset_name="synthetic", model_name="vae",
                 prior="exemplar_prior", number_components=50_000,
                 training_set_size=50_000, val_set_size=2_000,
                 test_set_size=1_000, batch_size=100, test_batch_size=1_000,
                 warmup=100, epochs=to_epoch,
                 early_stopping_epochs=to_epoch + 1,
                 S=8, MB=8, seed=14, compute_dtype="bfloat16",
                 prior_var_min=var_min,
                 snapshot_dir=tempfile.mkdtemp(prefix="sigma_diag_"))
    exp = Experiment(cfg, verbose=False)

    print(f"fast-forwarding (compiled epochs) to {from_epoch} ...", flush=True)
    while exp.epoch < from_epoch:
        m = exp.train_epoch()
        if exp.epoch % 25 == 0:
            print(f"  epoch {exp.epoch}: loss={m['loss']:.2f} "
                  f"plv={m['prior_log_var']:.3f}", flush=True)
        if m["loss"] != m["loss"]:
            print(f"  NaN during fast-forward at {exp.epoch}?!", flush=True)
            return

    # --- per-step instrumented replica of steps.make_epoch_fn's body ---
    def diag_step(state, x_raw, data_idx, bank, key, beta):
        k_bin, k_bank, k_z = jax.random.split(key, 3)
        x = preprocess_batch(k_bin, x_raw, input_type=cfg.input_type,
                             dynamic_binarization=cfg.dynamic_binarization,
                             train=True)

        def loss_fn(params):
            re, kl, out = elbo_terms(exp.model, {"params": params}, x, k_z,
                                     cfg, data_idx=data_idx, bank=bank,
                                     train=True, bank_key=k_bank)
            loss = jnp.mean(-re + beta * kl)
            return loss, (re, kl, out)

        (loss, (re, kl, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = exp.tx.update(grads, state.opt_state,
                                           state.params)
        params = optax.apply_updates(state.params, updates)
        gnorms = {k: optax.global_norm(v) for k, v in grads.items()}
        stats = {
            "loss": loss, "re": jnp.mean(-re), "kl": jnp.mean(kl),
            "q_mean_absmax": jnp.max(jnp.abs(out.q_mean)),
            "q_logvar_min": jnp.min(out.q_logvar),
            "q_logvar_max": jnp.max(out.q_logvar),
            "z_absmax": jnp.max(jnp.abs(out.z_top)),
            "raw_plv": state.params["prior_log_var"],
            "gnorm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), stats, gnorms

    diag_step = jax.jit(diag_step)

    records = []
    state = exp.state
    blew_up = None
    for epoch in range(from_epoch + 1, to_epoch + 1):
        beta = beta_schedule(epoch, cfg.warmup)
        ekey = jax.random.fold_in(exp.key, epoch)
        perm = exp._epoch_build(jax.random.fold_in(ekey, 2),
                                steps=exp.steps_per_epoch,
                                batch=cfg.batch_size)
        skey = jax.random.fold_in(ekey, 3)
        bank = _preprocess_bank(jax.random.fold_in(skey, 0x7FFFFFFF),
                                exp.bank, cfg)
        x2d = exp.train_x.reshape(exp.train_x.shape[0], -1)
        for i in range(exp.steps_per_epoch):
            k = jax.random.fold_in(skey, i)
            xi = jnp.take(x2d, perm[i], axis=0).reshape(
                (perm.shape[1],) + exp.train_x.shape[1:])
            eidx_i = jnp.take(exp.train_idx, perm[i])
            state, stats, gnorms = diag_step(state, xi, eidx_i, bank,
                                             k, jnp.float32(beta))
            rec = {k2: float(v) for k2, v in stats.items()}
            rec.update(epoch=epoch, step=i,
                       **{f"g_{k2}": float(v) for k2, v in gnorms.items()})
            records.append(rec)
            if rec["loss"] != rec["loss"]:
                blew_up = (epoch, i)
                break
        last = records[-1]
        print(f"  epoch {epoch}: loss={last['loss']:.2f} "
              f"gnorm={last['gnorm']:.1f} plv={last['raw_plv']:.3f} "
              f"qlv_min={last['q_logvar_min']:.2f} "
              f"zmax={last['z_absmax']:.1f}", flush=True)
        if blew_up:
            break

    if blew_up:
        print(f"\nNON-FINITE at epoch {blew_up[0]} step {blew_up[1]}; "
              f"last 30 steps:", flush=True)
        for r in records[-30:]:
            print("  " + json.dumps({k: (round(v, 4) if isinstance(v, float)
                                         else v) for k, v in r.items()}),
                  flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "sigma_collapse_diag.json")
    with open(path, "w") as f:
        json.dump({"var_min": var_min, "from_epoch": from_epoch,
                   "blew_up": blew_up, "tail": records[-200:]}, f)
    print(f"wrote {path} ({len(records)} step records)")


if __name__ == "__main__":
    main()
