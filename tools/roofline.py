"""Per-phase roofline of the headline train step (round-4 VERDICT item 3).

DESIGN.md §8b reads the 1.98 ms flagship step (VAE, N=50k bank, batch 100,
bf16) as "~56% of v5e bf16 peak, dominated by the mandatory bank-re-encode
GEMMs" — a reading, not a roofline. This tool turns it into one:

  * times each phase of the step (bank re-encode fwd, fwd+bwd, batch
    fwd/bwd, pairwise-LSE prior) and each dominant GEMM shape,
  * computes achieved TFLOP/s from analytic GEMM FLOPs,
  * calibrates the *practical* MXU ceiling for the step's exact GEMM
    shapes with standalone matmul timings — N=300/600-wide GEMMs pad to
    the 128-lane MXU tile, so "peak" for these shapes is well below the
    197 TFLOP/s marketing number, and the right question is "are we at
    the shape ceiling", not "are we at 197".

Measurement method (this matters on this host): the tunnel adds a
per-dispatch constant (measured and printed; ~0.06–30 ms depending on
tunnel state) that a single compiled call cannot separate from a 0.2–2 ms
phase. Every number here is therefore a SLOPE: each phase runs as a
carried lax.scan at two static lengths (lo, hi) and the per-iteration time
is (t_hi − t_lo) / (hi − lo), which cancels the dispatch latency and any
other per-call constant exactly. The span is ADAPTIVE: hi grows until the
measured delta clears a 60 ms floor, so fast phases (µs-scale bodies) are
resolved against host noise instead of drowned by it. The carry threads a
(1 + 1e-24·s) perturbation through the phase inputs so XLA can neither
hoist nor CSE the body across iterations (1e-24 is exactly representable
in bf16's 8-bit exponent; the value change is below bf16 resolution).
Gradient phases fold the sum of EVERY gradient leaf into the carry —
using only one leaf lets XLA dead-code-eliminate the other dW GEMMs
(observed: a 0.5 ms backward "measured" at 0.0002 ms).

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
EPS = 1e-24             # perturbation scale; exact in bf16, below resolution


def _median_time(compiled, args, iters):
    import jax

    out = compiled(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = compiled(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _slope_timed(step, carry0, *, lo=8, hi=64, iters=7,
                 target_delta_s=0.06, max_hi=65536):
    """Per-iteration seconds of `step(carry) -> carry`, measured as the
    slope between lax.scan programs of static length lo and hi. The slope
    cancels the per-dispatch constant (tunnel latency, arg transfer).

    The span is adaptive: hi doubles (or jumps to the estimated span)
    until t_hi − t_lo ≥ target_delta_s, so the delta is resolved against
    host noise (~1 ms) even for µs-scale bodies. Returns (sec_per_iter,
    diagnostics dict with the final lo/hi/delta for auditability)."""
    import jax

    def scan_of(length):
        def fn(c):
            def body(c, _):
                return step(c), ()
            c, _ = jax.lax.scan(body, c, None, length=length)
            return c
        return jax.jit(fn).lower(carry0).compile()

    t_lo = _median_time(scan_of(lo), (carry0,), iters)
    while True:
        t_hi = _median_time(scan_of(hi), (carry0,), iters)
        delta = t_hi - t_lo
        if delta >= target_delta_s or hi >= max_hi:
            break
        if delta <= 0:
            hi = min(hi * 8, max_hi)
        else:
            est_iters = int(target_delta_s * (hi - lo) / delta * 1.25) + lo
            hi = min(max(est_iters, hi * 2), max_hi)
    diag = {"lo": lo, "hi": hi, "delta_ms": round(delta * 1e3, 3)}
    return delta / (hi - lo), diag


def _dispatch_ms(iters=15):
    """Measured per-call tunnel+dispatch constant (the thing slope timing
    cancels): round-trip of a trivial compiled scalar program."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda s: s + 1.0).lower(jnp.float32(0)).compile()
    return _median_time(f, (jnp.float32(0),), iters) * 1e3


def gemm_row(label, m, k, n, *, lo=8, hi=64):
    """Slope-time a standalone bf16 (m,k)@(k,n) matmul with fp32
    accumulation (the layer contract: bf16 inputs, fp32 dist-head
    outputs). The carry perturbs x by (1+1e-24·Σy) each iteration."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, n), jnp.bfloat16)

    def step(x):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return x * (1.0 + EPS * jnp.sum(y)).astype(jnp.bfloat16)

    sec, diag = _slope_timed(step, x, lo=lo, hi=hi)
    flops = 2.0 * m * k * n
    row = {"phase": f"gemm {label} ({m}x{k})x({k}x{n})", "ms": sec * 1e3,
           "gflops": flops / 1e9, "tflops_s": flops / sec / 1e12,
           "pct_bf16_peak": 100.0 * flops / sec / V5E_BF16_PEAK,
           "span": diag}
    print(f"{row['phase']:52s} {row['ms']:8.3f} ms  "
          f"{row['tflops_s']:7.1f} TF/s  {row['pct_bf16_peak']:5.1f}% peak"
          f"  [hi={diag['hi']}, Δ={diag['delta_ms']:.1f}ms]",
          flush=True)
    return row


def main():
    import jax
    import jax.numpy as jnp

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.ops.knn import encode_bank
    from exemplar_vae_tpu.train.profiling import fetch_sync
    from exemplar_vae_tpu.train.trainer import Experiment

    n, b, h, dz, dx = 50_000, 100, 300, 40, 784
    rows = []

    disp_ms = _dispatch_ms()
    print(f"tunnel dispatch constant: {disp_ms:.2f} ms/call "
          f"(cancelled by slope timing)", flush=True)

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

    def add(phase, sec, flops, diag=None):
        row = {"phase": phase, "ms": sec * 1e3, "gflops": flops / 1e9,
               "tflops_s": flops / sec / 1e12,
               "pct_bf16_peak": 100.0 * flops / sec / V5E_BF16_PEAK}
        if diag is not None:
            row["span"] = diag
        rows.append(row)
        span = (f"  [hi={diag['hi']}, Δ={diag['delta_ms']:.1f}ms]"
                if diag else "")
        print(f"{phase:52s} {row['ms']:8.3f} ms  {row['tflops_s']:7.1f} TF/s"
              f"  {row['pct_bf16_peak']:5.1f}% peak{span}", flush=True)
        return row

    def perturb(v, s):
        return jax.tree_util.tree_map(lambda p: p * (1.0 + EPS * s), v)

    def all_leaf_sum(tree):
        # EVERY leaf must feed the carry: using only one leaf lets XLA
        # dead-code-eliminate the dW GEMMs of all the others.
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

    # -- bank re-encode, forward only (the cache-refresh shape) --
    def bank_fwd_step(s):
        m = encode_bank(model, perturb(variables, s), imgs, chunk=0,
                        remat=False)
        return EPS * jnp.sum(m)
    sec, diag = _slope_timed(bank_fwd_step, jnp.float32(0), lo=8, hi=72)
    add("bank re-encode fwd (50k rows)", sec, n * enc_fwd_row, diag)

    # -- bank re-encode, fwd+bwd (the exact-prior training shape) --
    def bank_fwd_bwd_step(s):
        g = jax.grad(lambda vv: jnp.sum(
            encode_bank(model, vv, imgs, chunk=0, remat=False)))(
                perturb(variables, s))
        return EPS * all_leaf_sum(g)
    sec, diag = _slope_timed(bank_fwd_bwd_step, jnp.float32(0), lo=8, hi=72)
    # bwd: dX chain (skip input layer) + dW for every GEMM ~= 2x fwd - dX_L1
    bank_bwd_flops = n * (2 * enc_fwd_row - 2.0 * dx * 2 * h)
    add("bank re-encode fwd+bwd", sec, n * enc_fwd_row + bank_bwd_flops, diag)

    # -- batch fwd+bwd, no prior (B=100 enc+dec) --
    xb = jnp.asarray(exp.train_x[:b], jnp.float32)

    def batch_fwd_bwd_step(s):
        def f(vv):
            out = model.apply(vv, xb, key)
            return jnp.sum(out.x_mean) + jnp.sum(out.q_mean)
        g = jax.grad(f)(perturb(variables, s))
        return EPS * all_leaf_sum(g)
    sec, diag = _slope_timed(batch_fwd_bwd_step, jnp.float32(0), lo=16, hi=144)
    add("batch enc+dec fwd+bwd (B=100)", sec,
        3.0 * b * (enc_fwd_row + dec_fwd_row), diag)

    # -- pairwise-LSE prior fwd and fwd+bwd at (B=100, N=50k) --
    means = encode_bank(model, variables, imgs, chunk=0, remat=False)
    z0 = jax.random.normal(key, (b, dz), jnp.float32)
    ld = jnp.log(jnp.float32(n - 1))

    def prior_fwd(z, mns):
        return jnp.sum(model.apply(
            variables, z, bank_means=mns, data_idx=exp.train_idx[:b],
            exemplar_idx=exp.bank.data_idx, valid=exp.bank.valid,
            log_denom=ld, impl="pallas", block_n=cfg.prior_block_n,
            method="log_p_z_top"))
    prior_flops = 3.0 * b * n * dz  # dist^2: sub, sq, accumulate

    def prior_fwd_step(z):
        out = prior_fwd(z, means)
        return z * (1.0 + EPS * out)
    sec, diag = _slope_timed(prior_fwd_step, z0, lo=16, hi=144)
    add("pairwise-LSE prior fwd (100x50k)", sec, prior_flops, diag)
    # bandwidth bound for this phase: stream the (N, dz) fp32 bank once
    prior_bw_bound_ms = (n * dz * 4) / V5E_HBM_BW * 1e3

    def prior_fwd_bwd_step(z):
        # fold BOTH cotangents into the carry so neither backward arm is
        # dead-code-eliminated (the means-grad is the expensive one).
        gz, gm = jax.grad(prior_fwd, argnums=(0, 1))(z, means)
        return z + EPS * gz * (1.0 + EPS * jnp.sum(gm))
    sec, diag = _slope_timed(prior_fwd_bwd_step, z0, lo=16, hi=144)
    add("pairwise-LSE prior fwd+bwd", sec, 3.0 * prior_flops, diag)

    # -- full step, measured the ablate_step way (200-step scan) --
    ekey = jax.random.fold_in(exp.key, 1)
    perm = exp._epoch_build(ekey, steps=200, batch=b)
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
    full = add("FULL STEP (epoch-scan, mandatory-GEMM FLOPs)", sec,
               step_flops)

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

    # shape-weighted ceiling: best-case ms for the full step if every
    # mandatory GEMM ran at its calibrated standalone rate. Encoder-side
    # GEMMs dominate; decoder/prior/optimizer leaves are charged at the
    # overall calibrated mean rate as an optimistic bound.
    cal = {g["phase"]: g for g in gemms}

    def cal_ms(label, flops):
        return flops / (cal[label]["tflops_s"] * 1e12) * 1e3

    # bank fwd: L1 + L2 + heads; bwd: dX(L2) + dW(L1) + dW(L2) + head leaves
    bank_gemm_ms = (
        cal_ms(f"gemm enc L1 fwd ({n}x{dx})x({dx}x{2*h})", 2.0 * n * dx * 2*h)
        + cal_ms(f"gemm enc L2 fwd ({n}x{h})x({h}x{2*h})", 2.0 * n * h * 2*h)
        + cal_ms(f"gemm enc heads fwd ({n}x{h})x({h}x{2*dz})",
                 2.0 * n * h * 2 * dz)
        + cal_ms(f"gemm enc L2 bwd dX ({n}x{2*h})x({2*h}x{h})",
                 2.0 * n * 2*h * h)
        + cal_ms(f"gemm enc L1 dW ({dx}x{n})x({n}x{2*h})", 2.0 * dx * n * 2*h)
        + cal_ms(f"gemm enc L2 dW ({h}x{n})x({n}x{2*h})", 2.0 * h * n * 2*h)
        # head dX + dW charged at the L2-dW rate (same K-major shape class)
        + cal_ms(f"gemm enc L2 dW ({h}x{n})x({n}x{2*h})",
                 2.0 * (2.0 * n * 2 * dz * h))
    )
    ceiling = {
        "bank_gemms_at_calibrated_rates_ms": round(bank_gemm_ms, 4),
        "full_step_measured_ms": round(full["ms"], 4),
        "note": ("best-case ms if each mandatory bank GEMM ran at its "
                 "standalone calibrated rate; batch/prior/optimizer "
                 "phases are additive on top"),
    }
    print(f"\nbank GEMMs at calibrated shape rates: {bank_gemm_ms:.3f} ms "
          f"vs full step {full['ms']:.3f} ms", flush=True)

    out = {"config": {"n": n, "batch": b, "hidden": h, "z": dz,
                      "compute_dtype": "bfloat16",
                      "device": str(jax.devices()[0])},
           "peaks": {"bf16_flops": V5E_BF16_PEAK, "hbm_bytes_s": V5E_HBM_BW},
           "method": "slope timing: (t_hi-t_lo)/(hi-lo) over carried "
                     "lax.scan lengths; cancels the per-dispatch constant",
           "tunnel_dispatch_ms": round(disp_ms, 3),
           "prior_fwd_hbm_bound_ms": round(prior_bw_bound_ms, 4),
           "phases": rows, "gemm_calibration": gemms,
           "shape_ceiling": ceiling}
    with open(_os.path.join(ROOT, "ROOFLINE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwrote ROOFLINE.json", flush=True)


if __name__ == "__main__":
    main()
