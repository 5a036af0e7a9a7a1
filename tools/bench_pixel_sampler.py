"""PixelHVAE autoregressive-sampling throughput: cropped receptive-field
decode (generate_from_top) vs the reference's full-canvas-per-pixel
strategy (generate_from_top_naive) — VERDICT r2 weak #6.

    /opt/venv/bin/python tools/bench_pixel_sampler.py [--batch 64]
        [--features 64] [--layers 4]

Prints both samplers' images/sec and the speedup.
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--skip_naive", action="store_true")
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.models import create_model
    from exemplar_vae_tpu.train.profiling import fetch_sync

    cfg = Config(model_name="pixelhvae_2level", prior="standard",
                 pixelcnn_features=ns.features, pixelcnn_layers=ns.layers,
                 compute_dtype="bfloat16")
    m = create_model(cfg)
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 28, 28, 1))
    v = m.init(k, x, k)
    z2 = jax.random.normal(jax.random.PRNGKey(1), (ns.batch, cfg.z2_size))

    results = {}
    methods = ["generate_from_top"]
    if not ns.skip_naive:
        methods.append("generate_from_top_naive")
    for method in methods:
        fn = jax.jit(lambda v, z, k, method=method:
                     m.apply(v, z, k, method=method))
        t0 = time.perf_counter()
        out = fn(v, z2, jax.random.PRNGKey(2))
        fetch_sync(out)
        print(f"{method}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        reps = 3
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(v, z2, jax.random.PRNGKey(3 + i))
        fetch_sync(out)
        dt = (time.perf_counter() - t0) / reps
        results[method] = dt
        print(f"{method}: {dt*1000:.0f} ms / batch of {ns.batch} "
              f"-> {ns.batch/dt:.1f} img/s", flush=True)
    if len(results) == 2:
        print(f"cropped-RF speedup: "
              f"{results['generate_from_top_naive']/results['generate_from_top']:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
