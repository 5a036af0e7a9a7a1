"""Step-cost ablation: attribute the train-step time to its pieces.

Times the compiled epoch scan under config variants (full step, no exemplar
prior, prior impl variants) at bench scale. Run on the TPU when idle:

    /opt/venv/bin/python tools/ablate_step.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time


def time_variant(label, cfg_kw, steps=200, stub_lse=False, repeats=1):
    import jax
    import jax.numpy as jnp
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    if stub_lse:
        # Fusion upper bound: replace the pairwise LSE with a consume-only
        # stub — the bank re-encode still runs (fwd AND bwd: the stub's
        # gradient touches every mean), only the prior kernel + the means
        # HBM round-trip disappear. full_step - this = the absolute most a
        # fused encode+prior megakernel could save (DESIGN.md §8e).
        # sharded_prior binds _pairwise_lse by name at import, so on a
        # multi-device mesh the trainer's sharded path would silently keep
        # the real kernel — patch BOTH module bindings.
        import exemplar_vae_tpu.ops.exemplar_prior as ep
        import exemplar_vae_tpu.parallel.sharded_prior as sp

        def _stub(z, means, log_var, data_idx, ex_idx, valid, impl, block_n):
            return jnp.sum(means, axis=0) @ jnp.ones(
                (means.shape[1],), jnp.float32) * 1e-12 + jnp.sum(
                z, axis=-1) * 1e-12
        orig = ep._pairwise_lse
        ep._pairwise_lse = _stub
        sp._pairwise_lse = _stub
        try:
            return time_variant(label, cfg_kw, steps, repeats=repeats)
        finally:
            ep._pairwise_lse = orig
            sp._pairwise_lse = orig

    kw = dict(dataset_name="synthetic", val_set_size=256, test_set_size=256,
              batch_size=100, hidden_size=300, z1_size=40, warmup=100,
              S=2, MB=2, compute_dtype="bfloat16", exact_reencode_chunk=0,
              exact_remat=False, snapshot_dir="/tmp/ablate_snap")
    kw.update(cfg_kw)
    cfg = Config(**kw)
    exp = Experiment(cfg, verbose=False)
    ekey = jax.random.fold_in(exp.key, 1)
    perm = exp._epoch_build(ekey, steps=steps, batch=cfg.batch_size)
    from exemplar_vae_tpu.train.profiling import fetch_sync
    beta = jnp.float32(1.0)
    st, _ = exp.epoch_fn(exp.state, exp.train_x, exp.train_idx, perm,
                         exp.bank, ekey, beta)
    fetch_sync(st.params)
    t0 = time.perf_counter()
    for r in range(repeats):  # repeats: amortize dispatch comparably when
        st, m = exp.epoch_fn(st, exp.train_x, exp.train_idx, perm,
                             exp.bank,  # steps/epoch is small
                             jax.random.fold_in(ekey, 2 + r), beta)
    fetch_sync(st.params)  # device->host fetch: real sync on the tunnel
    dt = (time.perf_counter() - t0) / (steps * repeats) * 1e3
    print(f"{label:55s} {dt:8.3f} ms/step  ({steps*cfg.batch_size/(dt*steps/1e3):8.0f} img/s)",
          flush=True)
    return dt


def main():
    n = 50_000
    ex = dict(prior="exemplar_prior", number_components=n, training_set_size=n)
    time_variant("standard prior (no bank at all)",
                 dict(prior="standard", training_set_size=n))
    time_variant("exemplar exact + pallas prior (bench config)",
                 dict(use_pallas_prior=True, **ex))
    time_variant("exemplar exact + jnp-scan prior",
                 dict(use_pallas_prior=False, **ex))
    time_variant("exemplar exact + pallas, LOO mask off",
                 dict(use_pallas_prior=True, no_mask=True, **ex))
    time_variant("exemplar exact + pallas, fp32 compute",
                 dict(use_pallas_prior=True, compute_dtype="float32", **ex))
    time_variant("exemplar exact + pallas, remat on",
                 dict(use_pallas_prior=True, exact_remat=True, **ex))
    time_variant("exemplar exact, LSE stubbed (fusion upper bound)",
                 dict(use_pallas_prior=True, **ex), stub_lse=True)


if __name__ == "__main__":
    main()
