"""Measure kNN top-k beyond the wide-path cutoff (round-3 VERDICT weak #5).

ops/knn.py::knn_indices uses a single lax.top_k up to 2*block (=2^20) cache
rows — measured through 1,048,576 in round 3 — and falls back to the exact
two-stage blocked reduction beyond that, which had never been measured.
This tool times both paths at and beyond the boundary on the real chip
(synthetic cache; the kernel only sees (B, N) distances so content is
irrelevant). Run when the TPU is idle:

    /opt/venv/bin/python tools/bench_knn_wide.py

Writes KNN_WIDE.json at the repo root.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from exemplar_vae_tpu.ops.knn import knn_indices
    from exemplar_vae_tpu.train.profiling import fetch_sync

    b, dz, k = 100, 40, 10
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(key, 1), (b, dz), jnp.float32)
    rows = []
    for n, block in [
        (1_048_576, 524_288),   # wide path at its cutoff (r3 reference point)
        (2_097_152, 524_288),   # blocked fallback, first size that triggers it
        (2_097_152, 2_097_152), # wide path forced at the same N (block=N)
        (4_194_304, 524_288),   # blocked fallback, 4M rows
    ]:
        cache = jax.random.normal(jax.random.fold_in(key, n % 97),
                                  (n, dz), jnp.float32)
        f = jax.jit(lambda q, c: knn_indices(q, c, k, block=block),
                    static_argnames=())
        t0 = time.perf_counter()
        idx = f(q, cache)
        fetch_sync(idx)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            idx = f(q, cache)
        fetch_sync(idx)
        ms = (time.perf_counter() - t0) / reps * 1e3
        path = "wide" if n <= 2 * block else "blocked"
        rows.append({"n": n, "block": block, "path": path,
                     "ms": round(ms, 2), "compile_s": round(compile_s, 1)})
        print(rows[-1], flush=True)
        del cache

    out = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "KNN_WIDE.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
