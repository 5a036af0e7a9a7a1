"""Benchmark harness (driver contract): prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json config 1): train images/sec/chip for the
VAE + dynamic-MNIST-shaped data + FULL exact exemplar prior (N = 50k,
re-encoded differentiably every step, fused Pallas pairwise-LSE).

vs_baseline anchors against the PyTorch re-expression of the reference's
step (tools/torch_reference_baseline.py) measured on this machine's CPU —
the reference never published throughput and this image has no CUDA torch
(BASELINE.md). The baseline number is cached in bench_baseline_cache.json.

Extra KPIs (exemplar-prior distances/sec, step latency) go to stderr so the
stdout contract stays one line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def measure_ours(n_exemplars=50_000, batch=100, timed_steps=200, seed=14):
    import jax
    import jax.numpy as jnp

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    cfg = Config(
        dataset_name="synthetic",       # MNIST-shaped; no dataset files in image
        model_name="vae",
        prior="exemplar_prior",
        number_components=n_exemplars,
        training_set_size=n_exemplars,
        val_set_size=256, test_set_size=256,
        batch_size=batch,
        hidden_size=300, z1_size=40,
        warmup=100, S=8, MB=8,
        use_pallas_prior=jax.default_backend() == "tpu",
        prior_block_n=2048,
        exact_reencode_chunk=0,        # one giant bank GEMM (no chunk serialization)
        exact_remat=False,             # keep bank activations (fits at MLP-50k scale)
        compute_dtype="bfloat16",      # MXU-native; loss math stays fp32
        snapshot_dir="/tmp/bench_snap",
        seed=seed,
    )
    exp = Experiment(cfg, verbose=False)
    ekey = jax.random.fold_in(exp.key, 1)
    perm = exp._epoch_build(ekey, steps=timed_steps, batch=batch)
    beta = jnp.float32(1.0)
    from exemplar_vae_tpu.train.profiling import fetch_sync
    # warmup/compile with the SAME static shapes as the timed run
    st, _ = exp.epoch_fn(exp.state, exp.train_x, exp.train_idx, perm,
                         exp.bank, ekey, beta)
    fetch_sync(st.params)
    t0 = time.perf_counter()
    st, metrics = exp.epoch_fn(st, exp.train_x, exp.train_idx, perm, exp.bank,
                               jax.random.fold_in(ekey, 1), beta)
    fetch_sync(st.params)  # device->host fetch: real sync on the tunnel
    dt = time.perf_counter() - t0
    ips = timed_steps * batch / dt
    dps = ips * n_exemplars  # exemplar-prior distances/sec
    return ips, dps, dt / timed_steps, float(metrics["loss"])


def baseline_images_per_sec(n_exemplars):
    """torch-cpu baseline at the SAME exemplar count as the measured run
    (a mismatched N would skew vs_baseline ~linearly in N).

    Returns (value, meta). Anchor provenance (round-4 VERDICT weak #3):
    the anchor drifted 1361x->1084x across rounds because the cache was
    re-measured under different host conditions and nothing recorded which
    measurement a BENCH artifact used. The cache now stores a ``_meta``
    record (date, steps, host load at measurement time) next to each
    value, and main() embeds it in the JSON line so every vs_baseline is
    attributable to one specific anchor measurement."""
    from tools.torch_reference_baseline import (
        baseline_cache_get, baseline_cache_put, measure_torch_baseline)
    key = f"torch_cpu_images_per_sec_N{n_exemplars}"
    cached = baseline_cache_get(key)
    if cached is not None:
        meta = baseline_cache_get(key + "_meta") or {
            "provenance": "legacy cache entry (pre-round-5, no metadata)"}
        return cached, dict(meta, key=key)
    load_before = os.getloadavg()[0]
    # >=20 timed steps, batch-only binarization (VERDICT r1 item 8)
    ips = measure_torch_baseline(n_exemplars=n_exemplars, steps=20, warmup=3)
    meta = {"date": time.strftime("%Y-%m-%d %H:%M:%S"),
            "steps": 20, "warmup": 3,
            "host_load_1min_before": round(load_before, 2)}
    baseline_cache_put(key, ips)
    baseline_cache_put(key + "_meta", meta)
    return ips, dict(meta, key=key)


def main():
    fast = os.environ.get("BENCH_FAST") == "1"
    timed_steps = 20 if fast else 200
    n_ex = 5_000 if fast else 50_000
    ips, dps, step_s, loss = measure_ours(n_exemplars=n_ex,
                                          timed_steps=timed_steps)
    print(f"[bench] ours: {ips:.1f} img/s, {dps:.3e} distances/s, "
          f"{step_s*1e3:.2f} ms/step, loss={loss:.2f}", file=sys.stderr)
    try:
        base, anchor_meta = baseline_images_per_sec(n_ex)
    except Exception as e:
        print(f"[bench] torch baseline failed: {e}", file=sys.stderr)
        base, anchor_meta = None, None
    vs = (ips / base) if base else None
    out = {
        "metric": "train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec (VAE, full exact exemplar prior N=%d, batch 100)" % n_ex,
        "vs_baseline": round(vs, 2) if vs else None,
    }
    if base is not None:
        # anchor provenance: which torch-CPU measurement vs_baseline used
        out["anchor"] = dict(anchor_meta or {}, images_per_sec=round(base, 2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
