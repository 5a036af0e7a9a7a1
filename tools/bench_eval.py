"""IWAE-evaluation throughput (the most expensive single call in the
reference — SURVEY.md §3.2). Measures test-points/sec at bench scale.

    /opt/venv/bin/python tools/bench_eval.py [S] [MB] [n_test] [impl]

impl: pallas (default) | scan — A/Bs the prior kernel at eval shapes.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time


def main():
    import jax
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    s_total = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_test = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    impl = sys.argv[4] if len(sys.argv) > 4 else "pallas"
    n = 50_000
    cfg = Config(dataset_name="synthetic", model_name="vae",
                 prior="exemplar_prior", number_components=n,
                 training_set_size=n, val_set_size=256, test_set_size=n_test,
                 batch_size=100, hidden_size=300, z1_size=40,
                 S=s_total, MB=r, test_batch_size=128,
                 use_pallas_prior=(impl == "pallas"),
                 compute_dtype="bfloat16", exact_reencode_chunk=0,
                 exact_remat=False, snapshot_dir="/tmp/bench_eval_snap")
    exp = Experiment(cfg, verbose=False)
    key = jax.random.fold_in(exp.key, 7)
    eval_bank = exp.build_eval_bank(exp.state.params, exp.bank, key)
    # warm (compiles chunk_nll)
    t0 = time.perf_counter()
    nll, _ = exp.iwae(exp.state.params, exp.splits.test_x[:128], key,
                      eval_bank, s_total=s_total)
    print(f"compile+first chunk: {time.perf_counter()-t0:.1f}s nll={nll:.2f}",
          flush=True)
    t0 = time.perf_counter()
    nll, per = exp.iwae(exp.state.params, exp.splits.test_x, key, eval_bank,
                        s_total=s_total)
    dt = time.perf_counter() - t0
    npts = len(per)
    print(f"IWAE S={s_total} (r={r}) over {npts} test points vs N={n} bank: "
          f"{dt:.2f}s -> {npts/dt:.1f} points/sec "
          f"({npts*s_total/dt:.0f} importance samples/sec); nll={nll:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
