"""On-device Pallas kernel validation.

tests/ run the LSE kernel in interpreter mode on CPU (conftest forces the
platform); this script runs the SAME oracle-equivalence checks compiled on
the real TPU — Mosaic compilation can differ from the interpreter.

    /opt/venv/bin/python tools/tpu_kernel_check.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from exemplar_vae_tpu.ops.exemplar_prior import exemplar_log_prob

    assert jax.default_backend() == "tpu", (
        f"expected TPU, got {jax.default_backend()}")
    failures = 0
    for b, n, d, blk in [(7, 533, 40, 128), (100, 50_000, 40, 2048),
                         (1, 1, 8, 256), (128, 2048 + 17, 64, 256),
                         (300, 12_345, 40, 2048)]:
        z = jax.random.normal(jax.random.PRNGKey(b), (b, d))
        mu = jax.random.normal(jax.random.PRNGKey(n), (n, d)) * 0.5
        lv = jnp.float32(-0.4)
        didx = (jnp.arange(b, dtype=jnp.int32) * 3) % n
        eidx = jnp.arange(n, dtype=jnp.int32)
        kw = dict(log_denom=jnp.log(float(max(n - 1, 1))), data_idx=didx,
                  exemplar_idx=eidx)
        want = exemplar_log_prob(z, mu, lv, impl="naive", **kw)
        got = exemplar_log_prob(z, mu, lv, impl="pallas", block_n=blk, **kw)
        err = float(jnp.max(jnp.abs(got - want)))
        # gradients through the shared custom VJP with the pallas forward
        g_want = jax.grad(lambda z: jnp.sum(exemplar_log_prob(
            z, mu, lv, impl="naive", **kw)))(z)
        g_got = jax.grad(lambda z: jnp.sum(exemplar_log_prob(
            z, mu, lv, impl="pallas", block_n=blk, **kw)))(z)
        gerr = float(jnp.max(jnp.abs(g_got - g_want)))
        ok = err < 1e-4 and gerr < 1e-2
        failures += 0 if ok else 1
        print(f"B={b:4d} N={n:6d} D={d:3d} blk={blk:5d}: "
              f"fwd max err {err:.2e}, dz max err {gerr:.2e} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
    if failures:
        raise SystemExit(f"{failures} case(s) FAILED")
    print("all pallas-on-TPU checks passed")


if __name__ == "__main__":
    main()
