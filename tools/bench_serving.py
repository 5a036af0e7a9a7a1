"""Serving-bundle throughput: exported StableHLO replay vs the live jit
path, on the same device.

    /opt/venv/bin/python tools/bench_serving.py [--n_gen 1024] [--n 10000]
        [--score_chunk 128] [--S 256] [--MB 64] [--iters 20]

Measures unconditional generation (img/s) and IWAE scoring (pts/s) through
the deserialized artifact AND through make_serving_fns under plain jit —
the delta is the serving-path overhead (expected ~0: both run the same XLA
program; timing ends with a device->host fetch, train/profiling.fetch_sync).
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_gen", type=int, default=1024)
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--score_chunk", type=int, default=128)
    ap.add_argument("--S", type=int, default=256)
    ap.add_argument("--MB", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ns = ap.parse_args()

    import jax
    import numpy as np

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.serve import (
        ServingBundle, export_serving_bundle, make_serving_fns)
    from exemplar_vae_tpu.train.evaluation import make_eval_bank_fn
    from exemplar_vae_tpu.train.loss import Bank
    from exemplar_vae_tpu.train.profiling import fetch_sync
    from exemplar_vae_tpu.models import create_model
    import jax.numpy as jnp

    cfg = Config(model_name="vae", prior="exemplar_prior", hidden_size=300,
                 z1_size=40, dataset_name="synthetic",
                 compute_dtype="bfloat16")
    m = create_model(cfg)
    k = jax.random.PRNGKey(0)
    x = (jax.random.uniform(k, (ns.n, 28, 28, 1)) > 0.5).astype(np.float32)
    v = m.init(k, x[:64], k)
    bank = Bank(images=jnp.asarray(x),
                data_idx=jnp.arange(ns.n, dtype=jnp.int32),
                valid=jnp.ones(ns.n, bool), cache_means=None,
                n_effective=ns.n)
    eb = make_eval_bank_fn(m, cfg)(v["params"], bank, k)

    out = "/tmp/bench_serving_bundle"
    r = min(ns.MB, ns.S)
    rounds = max(-(-ns.S // r), 1)
    export_serving_bundle(m, cfg, v["params"], out,
                          bank_means=eb.cache_means, data_idx=eb.data_idx,
                          valid=eb.valid, n_effective=ns.n,
                          n_gen=ns.n_gen, ref_batch=64,
                          score_chunk=ns.score_chunk, s_total=ns.S, r=r)
    b = ServingBundle.load(out)
    gen_fn, _, score_fn = make_serving_fns(
        m, cfg, ns.n, ns.n_gen, rounds, r)
    gen_jit = jax.jit(gen_fn)
    score_jit = jax.jit(score_fn)
    params = v["params"]
    key = jax.random.PRNGKey(3)

    def timed(fn, *args):
        fetch_sync(fn(*args))  # warm/compile
        t0 = time.perf_counter()
        for i in range(ns.iters):
            out = fn(*args)
        fetch_sync(out)
        return (time.perf_counter() - t0) / ns.iters

    dt_art = timed(lambda *a: b._fns["generate"](*a),
                   params, eb.cache_means, key)
    dt_jit = timed(gen_jit, params, eb.cache_means, key)
    print(f"generate[{ns.n_gen}]: artifact {ns.n_gen/dt_art:.0f} img/s "
          f"({dt_art*1e3:.2f} ms) vs jit {ns.n_gen/dt_jit:.0f} img/s "
          f"({dt_jit*1e3:.2f} ms) -> overhead "
          f"{(dt_art/dt_jit-1)*100:+.1f}%", flush=True)

    xc = x[:ns.score_chunk]
    dt_art = timed(lambda *a: b._fns["score_nll"](*a),
                   params, xc, key, eb.cache_means, eb.data_idx, eb.valid)
    dt_jit = timed(score_jit, params, xc, key, eb.cache_means, eb.data_idx,
                   eb.valid)
    pts = ns.score_chunk
    print(f"score_nll[chunk {pts}, S={rounds*r}, N={ns.n}]: artifact "
          f"{pts/dt_art:.1f} pts/s ({dt_art*1e3:.1f} ms) vs jit "
          f"{pts/dt_jit:.1f} pts/s ({dt_jit*1e3:.1f} ms) -> overhead "
          f"{(dt_art/dt_jit-1)*100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
