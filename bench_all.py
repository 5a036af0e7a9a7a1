"""Per-config benchmark suite over BASELINE.json's five configs.

``bench.py`` keeps the driver's one-JSON-line contract; this script measures
every config (synthetic data at the real shapes/sizes — the image has no
dataset files) and writes ``BENCH_extra.json`` with throughput + KPI rows
for BASELINE.md's measured columns.

    /opt/venv/bin/python bench_all.py [--fast]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def torch_baseline_for(cfg_kw):
    """Per-config torch-CPU baseline (cached). VERDICT r1 item 8: every
    BENCH_extra row gets a vs_baseline; exact-conv rows use a documented
    linear-in-N extrapolation (tools/torch_reference_baseline.py)."""
    from tools.torch_reference_baseline import (
        baseline_cache_get, baseline_cache_put,
        extrapolated_exact_baseline, measure_torch_config)
    n = cfg_kw.get("number_components", 0)
    model = cfg_kw.get("model_name", "vae")
    prior = cfg_kw.get("prior", "exemplar_prior")
    approx = cfg_kw.get("approximate_prior", False)
    ds = cfg_kw.get("dataset_name", "synthetic")
    shape = (3, 64, 64) if "continuous" in ds else (1, 28, 28)
    itype = ("continuous" if "continuous" in ds
             else "gray" if "gray" in ds else "binary")
    key = (f"{model}_{prior}_N{n}_approx{int(approx)}"
           f"_k{cfg_kw.get('approximate_k', 0)}_{itype}")
    cached = baseline_cache_get(key)
    if cached is not None:
        return cached, baseline_cache_get(key + "_detail")
    detail = None
    if model == "convhvae_2level" and not approx:
        ips, detail = extrapolated_exact_baseline(shape, itype, n)
    else:
        kw = dict(model_name=model, n_exemplars=max(n, 1000),
                  d_shape=shape, input_type=itype, prior=prior,
                  approximate=approx, k=cfg_kw.get("approximate_k", 10))
        if prior == "vampprior":
            kw["n_pseudo"] = n
            kw["n_exemplars"] = cfg_kw.get("training_set_size", 50_000)
        slow = model == "convhvae_2level" or shape[0] == 3
        kw.update(dict(min_steps=5 if slow else 20, warmup=1 if slow else 3,
                       budget_s=240.0))
        ips, _ = measure_torch_config(**kw)
    baseline_cache_put(key, ips)
    if detail:
        baseline_cache_put(key + "_detail", detail)
    return ips, detail


def measure(cfg_kw, timed_steps, label):
    import jax
    import jax.numpy as jnp
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    cfg = Config(snapshot_dir="/tmp/bench_all_snap", **cfg_kw)
    exp = Experiment(cfg, verbose=False)
    steps = min(timed_steps, exp.steps_per_epoch)
    ekey = jax.random.fold_in(exp.key, 1)
    perm = exp._epoch_build(ekey, steps=steps, batch=cfg.batch_size)
    from exemplar_vae_tpu.train.profiling import fetch_sync
    beta = jnp.float32(1.0)
    refresh_s = 0.0
    if cfg.approximate_prior:
        # real training kNN-selects over a cache refreshed once per epoch
        # (trainer.py) — benching against the all-zeros init cache would
        # time degenerate tie-broken gathers and report a loss real
        # training never produces; refresh first and charge the refresh's
        # per-epoch amortized cost to the step
        ck = jax.random.fold_in(exp.key, 99)
        cache = exp.cache_refresh(exp.state.params, exp.bank.images, ck)
        fetch_sync(cache)  # compile
        t0 = time.perf_counter()
        cache = exp.cache_refresh(exp.state.params, exp.bank.images,
                                  jax.random.fold_in(ck, 1))
        fetch_sync(cache)
        refresh_s = time.perf_counter() - t0
        exp.bank = exp.bank._replace(cache_means=cache)
    st, _ = exp.epoch_fn(exp.state, exp.train_x, exp.train_idx, perm,
                         exp.bank, ekey, beta)
    fetch_sync(st.params)
    t0 = time.perf_counter()
    st, m = exp.epoch_fn(st, exp.train_x, exp.train_idx, perm, exp.bank,
                         jax.random.fold_in(ekey, 2), beta)
    fetch_sync(st.params)  # device->host fetch: real sync on the tunnel
    dt = time.perf_counter() - t0
    raw_ms = dt / steps * 1e3
    # effective step cost = raw step + the per-epoch cache refresh
    # amortized over a real epoch's steps
    amort_ms = refresh_s * 1e3 / exp.steps_per_epoch
    eff_ms = raw_ms + amort_ms
    ips = cfg.batch_size / (eff_ms / 1e3)
    n_ex = cfg.number_components if cfg.prior == "exemplar_prior" else 0
    # distances/s: approximate steps STILL sweep all N cached means per
    # query in the kNN search (ops/knn.py), so N per image for both modes
    # — using k here would understate approximate rows ~N/k-fold and make
    # the KPI incomparable across rows
    dps = ips * n_ex
    row = {
        "config": label,
        "images_per_sec_per_chip": round(ips, 1),
        "ms_per_step": round(eff_ms, 3),
        "ms_per_step_raw": round(raw_ms, 3),
        "cache_refresh_ms_amortized": round(amort_ms, 3) or None,
        "exemplar_distances_per_sec": None if not n_ex else round(dps),
        "loss": round(float(m["loss"]), 2),
        "batch": cfg.batch_size,
        "n_exemplars": n_ex,
        "dtype": cfg.compute_dtype,
    }
    print(f"[bench_all] {label}: {row['images_per_sec_per_chip']} img/s "
          f"({row['ms_per_step']} ms/step)", file=sys.stderr, flush=True)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true")
    ns = p.parse_args(argv)
    scale = 0.1 if ns.fast else 1.0
    n50 = max(int(50_000 * scale), 2000)
    n200 = max(int(200_000 * scale), 4000)
    steps = 20 if ns.fast else 100
    common = dict(dataset_name="synthetic", val_set_size=256,
                  test_set_size=256, batch_size=100, warmup=100, S=2, MB=2,
                  compute_dtype="bfloat16", exact_reencode_chunk=0)
    configs = [
        ("1: VAE dynamic-MNIST-shaped, full exact exemplar prior",
         dict(model_name="vae", prior="exemplar_prior",
              number_components=n50, training_set_size=n50, **common)),
        ("2a: HVAE static-MNIST-shaped, full exact exemplar prior",
         dict(model_name="hvae_2level", prior="exemplar_prior",
              number_components=n50, training_set_size=n50, **common)),
        ("3: ConvHVAE Fashion-shaped, approximate-kNN exemplar prior",
         dict(model_name="convhvae_2level", prior="exemplar_prior",
              approximate_prior=True, approximate_k=10,
              number_components=n50, training_set_size=n50,
              dataset_name="synthetic_gray",
              **{k: v for k, v in common.items() if k != "dataset_name"})),
        # exact conv re-encode is intentionally capped: at 200k exemplars it
        # is the pathological config the approximate mode (4b) exists for
        ("4: ConvHVAE CelebA-shaped (3x64x64 continuous), exact exemplar "
         "prior, chunked bank re-encode (capped N)",
         dict(model_name="convhvae_2level", prior="exemplar_prior",
              number_components=min(n200, 20_000),
              training_set_size=min(n200, 20_000),
              dataset_name="synthetic_continuous",
              **{k: v for k, v in common.items()
                 if k not in ("dataset_name", "exact_reencode_chunk")},
              exact_reencode_chunk=4096)),
        ("4b: ConvHVAE CelebA-shaped, approximate-kNN K=10 (the intended "
         "mode at this scale)",
         dict(model_name="convhvae_2level", prior="exemplar_prior",
              approximate_prior=True, approximate_k=10,
              number_components=n200, training_set_size=n200,
              dataset_name="synthetic_continuous",
              **{k: v for k, v in common.items()
                 if k not in ("dataset_name", "exact_reencode_chunk")},
              exact_reencode_chunk=4096)),
        ("5: vamp-prior VAE (pseudo-input mixture) — comparison row",
         dict(model_name="vae", prior="vampprior", number_components=500,
              training_set_size=n50, **common)),
    ]
    rows = []
    for label, kw in configs:
        try:
            # heavy exact-conv configs get fewer timed steps
            cfg_steps = 10 if label.startswith("4:") else steps
            row = measure(kw, cfg_steps, label)
            try:
                base, detail = torch_baseline_for(kw)
                row["torch_cpu_images_per_sec"] = round(base, 2)
                row["vs_baseline"] = round(
                    row["images_per_sec_per_chip"] / base, 1)
                if detail:
                    row["baseline_note"] = detail
            except Exception as e:
                row["baseline_error"] = repr(e)[:200]
            rows.append(row)
        except Exception as e:  # keep the suite going; record the failure
            rows.append({"config": label, "error": repr(e)[:300]})
            print(f"[bench_all] {label} FAILED: {e}", file=sys.stderr)
    out = {"rows": rows, "fast": ns.fast}
    with open("BENCH_extra.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
