"""Export an AOT serving bundle from a trained snapshot dir.

    /opt/venv/bin/python tools/export_serving.py --vae_dir snapshots/<exp> \
        [--out <exp>/serving] [--n_gen 25] [--ref_batch 16] \
        [--score_chunk 16] [--S 64] [--MB 16] [--platforms cpu,tpu]

Loads the best checkpoint, builds the eval exemplar bank (full bank, no
LOO), and serializes generate / reference_generate / score_nll StableHLO
programs + weights (exemplar_vae_tpu/serve.py). The bundle replays on any
machine with a matching platform, no model code needed.
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae_dir", type=str, required=True)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--n_gen", type=int, default=25)
    ap.add_argument("--ref_batch", type=int, default=16)
    ap.add_argument("--score_chunk", type=int, default=16)
    ap.add_argument("--S", type=int, default=64)
    ap.add_argument("--MB", type=int, default=16)
    ap.add_argument("--platforms", type=str, default=None,
                    help="comma list for multi-platform artifacts "
                         "(needs --use_pallas_prior false models for cpu)")
    ns = ap.parse_args()

    import jax

    from exemplar_vae_tpu.serve import export_serving_bundle
    from exemplar_vae_tpu.train.augment import load_experiment

    exp = load_experiment(ns.vae_dir)
    out = ns.out or _os.path.join(ns.vae_dir, "serving")
    kw = {}
    if exp.bank is not None:
        key = jax.random.fold_in(exp.key, 1_000_003)
        eb = exp.build_eval_bank(exp.best_params, exp.bank, key)
        kw = dict(bank_means=eb.cache_means, data_idx=eb.data_idx,
                  valid=eb.valid, n_effective=eb.n_effective)
    manifest = export_serving_bundle(
        exp.model, exp.cfg, exp.best_params, out,
        n_gen=ns.n_gen, ref_batch=ns.ref_batch,
        score_chunk=ns.score_chunk, s_total=ns.S, r=ns.MB,
        platforms=([p.strip() for p in ns.platforms.split(",") if p.strip()]
                   if ns.platforms else None), **kw)
    size = sum(_os.path.getsize(_os.path.join(out, f))
               for f in _os.listdir(out))
    print(f"exported serving bundle to {out} "
          f"({size/1e6:.1f} MB, platforms={manifest['platforms']})")


if __name__ == "__main__":
    main()
