"""Step-cost ablation for the conv / approximate-kNN path (VERDICT r1
item 4: BENCH_extra configs 3 and 4b had no breakdown).

Times the compiled epoch scan under variants that isolate each suspect:
the B*K fresh re-encode, the kNN top-k over the cache, the bank gather,
and the conv model itself. Run on the TPU when idle:

    /opt/venv/bin/python tools/ablate_conv.py [--fast]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time


def time_variant(label, cfg_kw, steps=50):
    import jax
    import jax.numpy as jnp
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    kw = dict(val_set_size=256, test_set_size=256, batch_size=100,
              hidden_size=300, z1_size=40, z2_size=40, warmup=100,
              S=2, MB=2, compute_dtype="bfloat16",
              snapshot_dir="/tmp/ablate_conv_snap")
    kw.update(cfg_kw)
    cfg = Config(**kw)
    exp = Experiment(cfg, verbose=False)
    ekey = jax.random.fold_in(exp.key, 1)
    bank = exp.bank
    if cfg.approximate_prior and bank is not None:
        cache = exp.cache_refresh(exp.state.params, bank.images,
                                  jax.random.fold_in(ekey, 1))
        bank = bank._replace(cache_means=cache)
    perm = exp._epoch_build(ekey, steps=steps, batch=cfg.batch_size)
    from exemplar_vae_tpu.train.profiling import fetch_sync
    beta = jnp.float32(1.0)
    st, _ = exp.epoch_fn(exp.state, exp.train_x, exp.train_idx, perm,
                         bank, ekey, beta)
    fetch_sync(st.params)
    t0 = time.perf_counter()
    st, m = exp.epoch_fn(st, exp.train_x, exp.train_idx, perm, bank,
                         jax.random.fold_in(ekey, 2), beta)
    fetch_sync(st.params)  # device->host fetch: real sync on the tunnel
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"{label:58s} {dt:8.3f} ms/step  ({100/(dt/1e3):8.0f} img/s)",
          flush=True)
    return dt


def main():
    fast = "--fast" in sys.argv
    n200 = 20_000 if fast else 200_000
    n50 = 5_000 if fast else 50_000
    celeb = dict(model_name="convhvae_2level",
                 dataset_name="synthetic_continuous",
                 exact_reencode_chunk=4096)
    apx = dict(prior="exemplar_prior", approximate_prior=True)

    print("== config 4b: ConvHVAE CelebA-shaped, approx kNN ==")
    time_variant("standard prior (conv fwd/bwd only)",
                 dict(prior="standard", training_set_size=n200, **celeb))
    time_variant("approx K=10, N=200k (bench row 4b)",
                 dict(approximate_k=10, number_components=n200,
                      training_set_size=n200, **apx, **celeb))
    time_variant("approx K=1, N=200k (isolate B*K re-encode)",
                 dict(approximate_k=1, number_components=n200,
                      training_set_size=n200, **apx, **celeb))
    time_variant("approx K=10, N=50k (isolate cache top-k + gather)",
                 dict(approximate_k=10, number_components=n50,
                      training_set_size=n50, **apx, **celeb))

    print("== config 3: ConvHVAE Fashion-shaped (28x28 gray), approx ==")
    fash = dict(model_name="convhvae_2level", dataset_name="synthetic_gray",
                exact_reencode_chunk=0)
    time_variant("standard prior (conv fwd/bwd only)",
                 dict(prior="standard", training_set_size=n50, **fash))
    time_variant("approx K=10, N=50k (bench row 3)",
                 dict(approximate_k=10, number_components=n50,
                      training_set_size=n50, **apx, **fash))
    time_variant("approx K=1, N=50k",
                 dict(approximate_k=1, number_components=n50,
                      training_set_size=n50, **apx, **fash))

    print("== MLP control: same kNN machinery, no convs ==")
    time_variant("MLP VAE approx K=10, N=200k, MNIST-shaped",
                 dict(model_name="vae", dataset_name="synthetic",
                      approximate_k=10, number_components=n200,
                      training_set_size=n200, exact_reencode_chunk=0, **apx))


if __name__ == "__main__":
    main()
