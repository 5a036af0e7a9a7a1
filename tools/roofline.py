"""Per-phase roofline of the headline train step (round-4 VERDICT item 3).

DESIGN.md §8b reads the 1.98 ms flagship step (VAE, N=50k bank, batch 100,
bf16) as "~56% of v5e bf16 peak, dominated by the mandatory bank-re-encode
GEMMs" — a reading, not a roofline. This tool turns it into one:

  * times each phase of the step as its own compiled program (bank
    re-encode fwd, fwd+bwd, batch fwd/bwd, pairwise-LSE prior),
  * computes achieved TFLOP/s from analytic GEMM FLOPs (and XLA's
    cost_analysis where the backend reports it),
  * calibrates the *practical* MXU ceiling for the step's exact GEMM
    shapes with standalone matmul timings — N=300/600-wide GEMMs pad to
    the 128-lane MXU tile, so "peak" for these shapes is well below the
    197 TFLOP/s marketing number, and the right question is "are we at
    the shape ceiling", not "are we at 197".

Writes ROOFLINE.json and prints a markdown table for DESIGN.md §8h.

    /opt/venv/bin/python tools/roofline.py          # on the idle TPU
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
V5E_BF16_PEAK = 197e12  # TPU v5e per-chip bf16 MXU peak, FLOP/s
V5E_HBM_BW = 819e9      # bytes/s


def _timed(fn, args, iters, inner):
    """Median of `iters` timings of a compiled `inner`-step scan; returns
    seconds per single application of fn."""
    import jax

    from exemplar_vae_tpu.train.profiling import fetch_sync

    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    fetch_sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = compiled(*args)
        fetch_sync(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / inner, compiled


def _cost_flops(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def _scan_wrap(step, inner):
    """Wrap `step(x) -> x`-shaped work in a lax.scan of `inner` iterations
    with a carried data dependency so XLA cannot hoist or CSE it."""
    import jax

    def fn(x0):
        def body(x, _):
            return step(x), ()
        x, _ = jax.lax.scan(body, x0, None, length=inner)
        return x
    return fn


def gemm_row(label, m, k, n, *, iters=7, inner=20):
    """Time a standalone bf16 (m,k)@(k,n) matmul with fp32 accumulation
    (the layer contract: bf16 inputs, fp32 dist-head outputs)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, n), jnp.bfloat16)

    def step(x):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        # fold y back into x so the scan carries a true dependency
        return x * (1.0 + 0.0 * jnp.sum(y).astype(jnp.bfloat16))

    sec, _ = _timed(_scan_wrap(step, inner), (x,), iters, inner)
    flops = 2.0 * m * k * n
    row = {"phase": f"gemm {label} ({m}x{k})x({k}x{n})", "ms": sec * 1e3,
           "gflops": flops / 1e9, "tflops_s": flops / sec / 1e12,
           "pct_bf16_peak": 100.0 * flops / sec / V5E_BF16_PEAK}
    print(f"{row['phase']:52s} {row['ms']:8.3f} ms  "
          f"{row['tflops_s']:7.1f} TF/s  {row['pct_bf16_peak']:5.1f}% peak",
          flush=True)
    return row


def main():
    import jax
    import jax.numpy as jnp

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.ops.knn import encode_bank
    from exemplar_vae_tpu.train.trainer import Experiment

    n, b, h, dz, dx = 50_000, 100, 300, 40, 784
    rows = []

    print("== phase timings (flagship config: VAE, N=50k, B=100, bf16) ==",
          flush=True)
    cfg = Config(dataset_name="synthetic", prior="exemplar_prior",
                 number_components=n, training_set_size=n,
                 val_set_size=256, test_set_size=256, batch_size=b,
                 hidden_size=h, z1_size=dz, warmup=100, S=2, MB=2,
                 compute_dtype="bfloat16", exact_reencode_chunk=0,
                 exact_remat=False, use_pallas_prior=True,
                 snapshot_dir="/tmp/roofline_snap")
    exp = Experiment(cfg, verbose=False)
    variables = {"params": exp.state.params}
    model = exp.model
    imgs = exp.bank.images
    key = jax.random.fold_in(exp.key, 7)

    # analytic GEMM FLOPs per encoder row: gated(784->300) + gated(300->300)
    # + two 40-dim heads, each gated layer = one 2x-width fused GEMM
    enc_fwd_row = 2.0 * (dx * 2 * h + h * 2 * h + 2 * h * dz)
    dec_fwd_row = 2.0 * (dz * 2 * h + h * 2 * h + h * dx)  # sigmoid head

    def add(phase, sec, flops, compiled=None):
        row = {"phase": phase, "ms": sec * 1e3, "gflops": flops / 1e9,
               "tflops_s": flops / sec / 1e12,
               "pct_bf16_peak": 100.0 * flops / sec / V5E_BF16_PEAK}
        if compiled is not None:
            xf = _cost_flops(compiled)
            if xf == xf:
                row["xla_cost_gflops"] = xf / 1e9
        rows.append(row)
        print(f"{phase:52s} {row['ms']:8.3f} ms  {row['tflops_s']:7.1f} TF/s"
              f"  {row['pct_bf16_peak']:5.1f}% peak", flush=True)
        return row

    # -- bank re-encode, forward only (the cache-refresh shape) --
    def bank_fwd(v):
        m = encode_bank(model, v, imgs, chunk=0, remat=False)
        return jnp.sum(m)
    sec, comp = _timed(bank_fwd, (variables,), 7, 1)
    add("bank re-encode fwd (50k rows)", sec, n * enc_fwd_row, comp)

    # -- bank re-encode, fwd+bwd (the exact-prior training shape) --
    def bank_fwd_bwd(v):
        return jax.grad(lambda vv: jnp.sum(
            encode_bank(model, vv, imgs, chunk=0, remat=False)))(v)
    sec, comp = _timed(bank_fwd_bwd, (variables,), 7, 1)
    # bwd: dX chain (skip input layer) + dW for every GEMM ~= 2x fwd - dX_L1
    bank_bwd_flops = n * (2 * enc_fwd_row - 2.0 * dx * 2 * h)
    add("bank re-encode fwd+bwd", sec, n * enc_fwd_row + bank_bwd_flops, comp)

    # -- batch fwd+bwd, no prior (B=100 enc+dec) --
    xb = jnp.asarray(exp.train_x[:b], jnp.float32)

    def batch_fwd_bwd(v):
        def f(vv):
            out = model.apply(vv, xb, key)
            return jnp.sum(out.x_mean) + jnp.sum(out.q_mean)
        return jax.grad(f)(v)
    sec, comp = _timed(batch_fwd_bwd, (variables,), 7, 1)
    add("batch enc+dec fwd+bwd (B=100)", sec,
        3.0 * b * (enc_fwd_row + dec_fwd_row), comp)

    # -- pairwise-LSE prior fwd and fwd+bwd at (B=100, N=50k) --
    means = encode_bank(model, variables, imgs, chunk=0, remat=False)
    z = jax.random.normal(key, (b, dz), jnp.float32)
    ld = jnp.log(jnp.float32(n - 1))

    def prior_fwd(z, means):
        return jnp.sum(model.apply(
            variables, z, bank_means=means, data_idx=exp.train_idx[:b],
            exemplar_idx=exp.bank.data_idx, valid=exp.bank.valid,
            log_denom=ld, impl="pallas", block_n=cfg.prior_block_n,
            method="log_p_z_top"))
    prior_flops = 3.0 * b * n * dz  # dist^2: sub, sq, accumulate
    sec, comp = _timed(prior_fwd, (z, means), 7, 1)
    add("pairwise-LSE prior fwd (100x50k)", sec, prior_flops, comp)

    def prior_fwd_bwd(z, means):
        return jax.grad(prior_fwd, argnums=(0, 1))(z, means)
    sec, comp = _timed(prior_fwd_bwd, (z, means), 7, 1)
    add("pairwise-LSE prior fwd+bwd", sec, 3.0 * prior_flops, comp)

    # -- full step, measured the ablate_step way (200-step scan) --
    ekey = jax.random.fold_in(exp.key, 1)
    perm = exp._epoch_build(ekey, steps=200, batch=b)
    from exemplar_vae_tpu.train.profiling import fetch_sync
    beta = jnp.float32(1.0)
    st, _ = exp.epoch_fn(exp.state, exp.train_x, exp.train_idx, perm,
                         exp.bank, ekey, beta)
    fetch_sync(st.params)
    t0 = time.perf_counter()
    st, _ = exp.epoch_fn(st, exp.train_x, exp.train_idx, perm, exp.bank,
                         jax.random.fold_in(ekey, 2), beta)
    fetch_sync(st.params)
    sec = (time.perf_counter() - t0) / 200
    step_flops = (n * enc_fwd_row + bank_bwd_flops          # bank re-encode
                  + 3.0 * b * (enc_fwd_row + dec_fwd_row)   # batch enc+dec
                  + 3.0 * prior_flops)                      # prior
    add("FULL STEP (epoch-scan, mandatory-GEMM FLOPs)", sec, step_flops)

    print("\n== GEMM shape calibration (practical MXU ceiling) ==", flush=True)
    gemms = [
        gemm_row("enc L1 fwd", n, dx, 2 * h),
        gemm_row("enc L2 fwd", n, h, 2 * h),
        gemm_row("enc L2 bwd dX", n, 2 * h, h),
        gemm_row("enc L1 dW", dx, n, 2 * h),
        gemm_row("enc L2 dW", h, n, 2 * h),
        gemm_row("enc heads fwd", n, h, 2 * dz),
        gemm_row("batch enc L1 (B=100)", b, dx, 2 * h),
    ]

    out = {"config": {"n": n, "batch": b, "hidden": h, "z": dz,
                      "compute_dtype": "bfloat16",
                      "device": str(jax.devices()[0])},
           "peaks": {"bf16_flops": V5E_BF16_PEAK, "hbm_bytes_s": V5E_HBM_BW},
           "phases": rows, "gemm_calibration": gemms}
    with open(_os.path.join(ROOT, "ROOFLINE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwrote ROOFLINE.json", flush=True)


if __name__ == "__main__":
    main()
