"""A/B microbenchmark of the pairwise-LSE exemplar-prior implementations.

VERDICT.md round-1 item 3: the Pallas kernel's claimed value ("avoids the
(B, N) intermediate at IWAE eval batch shapes") was asserted, never measured.
This tool measures it: forward-only at eval shapes (B = test_chunk * MB
importance rows vs the full bank) and forward+backward at train shapes,
for impl in {scan, pallas} and input dtype in {float32, bfloat16}.

    /opt/venv/bin/python tools/bench_prior.py [N] [D]

Prints one markdown table (for docs/DESIGN.md §8) plus a JSON line per row.
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from exemplar_vae_tpu.ops.exemplar_prior import exemplar_log_prob


def _sync(out):
    """Force a device->host fetch: on the tunneled axon platform
    block_until_ready can return before execution finishes (observed on
    large-output matmuls); fetching a scalar element always synchronizes."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def time_fn(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(_sys.argv[1]) if len(_sys.argv) > 1 else 50_000
    d = int(_sys.argv[2]) if len(_sys.argv) > 2 else 40
    key = jax.random.PRNGKey(0)
    means_f32 = jax.random.normal(key, (n, d), jnp.float32)
    ex_idx = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.ones((n,), bool)
    log_var = jnp.float32(-1.3)
    ld = jnp.log(jnp.float32(n))

    rows = []

    def run(mode, b, impl, dtype):
        z = jax.random.normal(jax.random.fold_in(key, b), (b, d), dtype)
        means = means_f32.astype(dtype)

        if mode == "fwd":
            @jax.jit
            def f(z, means):
                return exemplar_log_prob(
                    z, means, log_var, log_denom=ld, exemplar_idx=ex_idx,
                    valid=valid, impl=impl)
            dt = time_fn(f, z, means)
        else:  # fwd+bwd at train shapes, LOO on
            loo = jnp.arange(b, dtype=jnp.int32)

            @jax.jit
            def f(z, means):
                def loss(z, means):
                    return jnp.sum(exemplar_log_prob(
                        z, means, log_var, log_denom=jnp.log(jnp.float32(n - 1)),
                        data_idx=loo, exemplar_idx=ex_idx, valid=valid,
                        impl=impl))
                return jax.grad(loss, argnums=(0, 1))(z, means)
            dt = time_fn(f, z, means)

        flops = 2.0 * b * n * d * (3 if mode != "fwd" else 1)
        row = {"mode": mode, "B": b, "impl": impl, "dtype": str(dtype.__name__),
               "ms": round(dt * 1e3, 3), "tflops": round(flops / dt / 1e12, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    for b in (1024, 4096, 8192, 32768):
        for impl in ("scan", "pallas", "pallas_bf16"):
            run("fwd", b, impl, jnp.float32)
    for b in (100, 1024):
        for impl in ("scan", "pallas"):
            run("fwdbwd", b, impl, jnp.float32)

    print("\n| mode | B | impl | in dtype | ms | TFLOP/s (true D) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['mode']} | {r['B']} | {r['impl']} | {r['dtype']} "
              f"| {r['ms']} | {r['tflops']} |")


if __name__ == "__main__":
    main()
