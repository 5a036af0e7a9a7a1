"""IWAE-evaluation throughput (the most expensive single call in the
reference — SURVEY.md §3.2). Measures test-points/sec at bench scale.

    /opt/venv/bin/python tools/bench_eval.py [--S 1024] [--MB 256]
        [--n_test 512] [--model vae] [--impl pallas] [--generic] [--n 50000]

--impl scan A/Bs the prior kernel at eval shapes; --generic disables the
encode-once fast path (A/Bs the per-round re-encode).
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=1024)
    ap.add_argument("--MB", type=int, default=256)
    ap.add_argument("--n_test", type=int, default=512)
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--model", type=str, default="vae",
                    choices=["vae", "hvae_2level", "convhvae_2level",
                             "pixelhvae_2level"])
    ap.add_argument("--dataset", type=str, default=None,
                    help="synthetic | synthetic_gray | synthetic_continuous")
    ap.add_argument("--impl", type=str, default="pallas",
                    choices=["pallas", "scan"])
    ap.add_argument("--generic", action="store_true",
                    help="disable the encode-once fast path")
    ns = ap.parse_args()

    import jax
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.evaluation import make_iwae_fn
    from exemplar_vae_tpu.train.trainer import Experiment

    ds = ns.dataset or ("synthetic_gray" if "conv" in ns.model else "synthetic")
    cfg = Config(dataset_name=ds, model_name=ns.model,
                 prior="exemplar_prior", number_components=ns.n,
                 training_set_size=ns.n, val_set_size=256, test_set_size=ns.n_test,
                 batch_size=100, hidden_size=300, z1_size=40, z2_size=40,
                 S=ns.S, MB=ns.MB, test_batch_size=128,
                 use_pallas_prior=(ns.impl == "pallas"),
                 compute_dtype="bfloat16", exact_reencode_chunk=8192,
                 exact_remat=False, snapshot_dir="/tmp/bench_eval_snap")
    exp = Experiment(cfg, verbose=False)
    # exp.cfg, not cfg: the loader fills input_type/input_size — building a
    # second iwae fn from the pre-load cfg silently evaluates the wrong
    # likelihood (cost a debugging session; keep using exp.cfg)
    iwae = (make_iwae_fn(exp.model, exp.cfg, force_generic=True)
            if ns.generic else exp.iwae)
    key = jax.random.fold_in(exp.key, 7)
    eval_bank = exp.build_eval_bank(exp.state.params, exp.bank, key)
    # warm (compiles chunk_nll)
    t0 = time.perf_counter()
    nll, _ = iwae(exp.state.params, exp.splits.test_x[:128], key,
                  eval_bank, s_total=ns.S)
    print(f"compile+first chunk: {time.perf_counter()-t0:.1f}s nll={nll:.2f}",
          flush=True)
    t0 = time.perf_counter()
    nll, per = iwae(exp.state.params, exp.splits.test_x, key, eval_bank,
                    s_total=ns.S)
    dt = time.perf_counter() - t0
    npts = len(per)
    mode = "generic" if ns.generic else "fast"
    print(f"IWAE[{ns.model}/{ns.impl}/{mode}] S={ns.S} (r={ns.MB}) over "
          f"{npts} test points vs N={ns.n} bank: "
          f"{dt:.2f}s -> {npts/dt:.1f} points/sec "
          f"({npts*ns.S/dt:.0f} importance samples/sec); nll={nll:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
