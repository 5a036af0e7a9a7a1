"""Config-4 bank-sharded proof at GENUINE scale (round-4 VERDICT item 1).

BASELINE.json config 4 names the design: "ConvHVAE on CelebA — exemplar
bank sharded over the mesh". parallel/sharded_knn.py implements it and CI
pins its numerics, but only at toy N. This tool builds the REAL config-4
Experiment — N=200k CelebA-shaped uint8, approximate prior K=10 — on the
virtual 8-device CPU mesh and proves the sharded path at that scale:

  * the bank + kNN cache shard over 'data' at ~307 MB + ~20 MB per device
    (the DESIGN.md §8g "a v4-8 holds N=200k at ~300 MB/chip" claim,
    previously unexercised);
  * the sharded cache refresh executes over all 200k rows;
  * a budget-capped slice of the compiled epoch scan (epoch_splits chunks
    are the identical program modulo trip count) executes, plus a
    validation pass.

One CPU core executes all 8 virtual devices, so the epoch is capped at
one chunk — wall time is meaningless here; memory layout and
compile+execute success at genuine N are the claims under test.

    /opt/venv/bin/python tools/cfg4_sharded_proof.py [--n 200000] [--steps 4]

Writes CFG4_SHARDED.json at the repo root.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

_os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import argparse
import json
import tempfile
import time

MB = 2.0 ** 20
ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--steps", type=int, default=4,
                    help="budget-capped steps of the epoch scan to execute")
    args = ap.parse_args()

    import jax

    # axon's sitecustomize overrides env vars; the config API wins
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    from exemplar_vae_tpu.compile_cache import enable as enable_cache
    enable_cache()

    import jax.numpy as jnp

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    t0 = time.perf_counter()

    def phase(msg):
        print(f"[cfg4-sharded +{time.perf_counter() - t0:7.1f}s] {msg}",
              flush=True)

    assert len(jax.devices()) == 8, jax.devices()
    phase(f"8 virtual CPU devices up; building Experiment n={args.n}")

    # the real config-4 recipe, mesh'd; epoch_splits so one chunk == a
    # budget-capped slice of the true compiled epoch program
    splits = 2000 // args.steps if args.n == 200_000 else 0
    cfg = Config(model_name="convhvae_2level", prior="exemplar_prior",
                 approximate_prior=True, approximate_k=10,
                 number_components=args.n, training_set_size=args.n,
                 dataset_name="synthetic_continuous", val_set_size=256,
                 test_set_size=256, batch_size=100, warmup=100, S=2, MB=2,
                 compute_dtype="bfloat16", exact_reencode_chunk=4096,
                 mesh_shape=(8,), epoch_splits=splits,
                 snapshot_dir=tempfile.mkdtemp(prefix="cfg4sh_"))
    exp = Experiment(cfg, verbose=False)
    assert exp.multi and exp.sharded_approx_fn is not None
    chunk = exp.steps_per_epoch // exp.epoch_splits
    phase(f"setup done: {exp.steps_per_epoch} steps/epoch in "
          f"{exp.epoch_splits} chunks of {chunk}")

    # --- per-shard posture: the §8g "~300 MB/chip" claim ---
    def shard_mb(arr):
        return round(max(s.data.nbytes for s in arr.addressable_shards) / MB, 1)

    row = {"n": args.n, "devices": 8, "chunk_steps": chunk,
           "bank_mb_per_device": shard_mb(exp.bank.images),
           "cache_mb_per_device": shard_mb(exp.bank.cache_means),
           "bank_rows_per_device": exp.bank.images.shape[0] // 8,
           "bank_dtype": str(exp.bank.images.dtype)}
    phase(f"per-device posture: bank {row['bank_mb_per_device']} MB + "
          f"cache {row['cache_mb_per_device']} MB "
          f"({row['bank_rows_per_device']} rows/device, "
          f"{row['bank_dtype']})")

    # --- sharded cache refresh over ALL n rows ---
    tr = time.perf_counter()
    ekey = jax.random.fold_in(exp.key, 1)
    cache = exp.cache_refresh(exp.state.params, exp.bank.images,
                              jax.random.fold_in(ekey, 1))
    jax.block_until_ready(cache)
    exp.bank = exp.bank._replace(cache_means=cache)
    row["cache_refresh_seconds"] = round(time.perf_counter() - tr, 1)
    phase(f"sharded cache refresh over {args.n} rows OK in "
          f"{row['cache_refresh_seconds']}s")

    # --- one budget-capped chunk of the true epoch program ---
    perm = exp._epoch_build(jax.random.fold_in(ekey, 2),
                            steps=exp.steps_per_epoch, batch=cfg.batch_size)
    te = time.perf_counter()
    exp.state, m = exp.epoch_fn(exp.state, exp.train_x, exp.train_idx,
                                perm[:chunk], exp.bank,
                                jax.random.fold_in(ekey, 3),
                                jnp.float32(0.01), jnp.int32(0))
    jax.block_until_ready(exp.state.params)
    row.update(chunk_seconds=round(time.perf_counter() - te, 1),
               chunk_loss=float(m["loss"]))
    phase(f"epoch chunk ({chunk} steps, sharded prior+kNN) OK in "
          f"{row['chunk_seconds']}s, loss={row['chunk_loss']:.3f}")

    # --- validation at genuine bank scale ---
    tv = time.perf_counter()
    val_loss, _, _ = exp.validate()
    row.update(val_seconds=round(time.perf_counter() - tv, 1),
               val_loss=float(val_loss), ok=True,
               total_seconds=round(time.perf_counter() - t0, 1))
    phase(f"validate OK: val_loss={float(val_loss):.3f}")

    out = _os.path.join(ROOT, "CFG4_SHARDED.json")
    with open(out, "w") as fh:
        json.dump(row, fh, indent=1)
    phase(f"wrote {out}: {json.dumps(row)}")


if __name__ == "__main__":
    main()
