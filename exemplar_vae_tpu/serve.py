"""AOT serving bundles (beyond the reference — SURVEY.md §0.5: the
reference has no deployment story; serving here is a TPU-native extra).

A bundle is a directory of `jax.export` StableHLO artifacts + weights that
serves a trained model WITHOUT any model code: the compiled programs for

* ``generate``           — unconditional samples via the exemplar-prior
                           generative process (paper §3): n ~ U(N),
                           z ~ N(mu_n, sigma^2 I), decode. Mirrors
                           train/sampling.py::generate_x's key discipline
                           bit-for-bit, with the exemplar means read from a
                           precomputed bank instead of re-encoded (identical
                           at eval: preprocessing is deterministic there —
                           ops/preprocess.py).
* ``reference_generate`` — exemplar-conditioned generation (the
                           data-augmentation primitive).
* ``score_nll``          — per-point IWAE NLL of one fixed-shape chunk
                           (the reference eval protocol at serving time:
                           full bank, no LOO); the loader loops chunks.

Shapes are fixed at export (XLA's AOT contract); weights stay an INPUT so
one artifact serves re-trained checkpoints of the same architecture. The
serialized programs replay on any machine with the same platform ('tpu'
artifacts on any TPU host; pass platforms=('cpu',) for CPU-portable ones —
multi-platform works when cfg.use_pallas_prior=False, since the Pallas
kernel only lowers for TPU).

CLI: tools/export_serving.py --vae_dir snapshots/<experiment>.

Measured replay cost vs the live jit path (tools/bench_serving.py, one
v5e): IWAE scoring at parity (-0.1%, 4.8 ms/chunk at S=256, N=10k);
generation pays a fixed ~1.2 ms/call extra on this tunneled chip
(5.23 vs 4.04 ms at batch 8192 -> 1.57M img/s replayed) — a dispatch-path
constant that amortizes with device time, not a program-quality gap.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from exemplar_vae_tpu.config import Config
from exemplar_vae_tpu.models import create_model
from exemplar_vae_tpu.models.base import clamped_prior_log_var
from exemplar_vae_tpu.ops.preprocess import preprocess_batch
from exemplar_vae_tpu.train.loss import Bank
from exemplar_vae_tpu.train.sampling import _top_dim


def make_serving_fns(model, cfg: Config, n_effective: int,
                     n_gen: int, rounds: int, r: int):
    """Pure fixed-shape functions to export. All take the params dict as
    their first argument; exemplar-bank arrays ride alongside so the bank
    can be refreshed without re-exporting."""

    def generate(params, bank_means, key):
        variables = {"params": params}
        k_pick, _k_bin, k_z, k_dec = jax.random.split(key, 4)
        if cfg.prior == "standard":
            z = jax.random.normal(k_z, (n_gen, _top_dim(cfg)))
        elif cfg.prior == "vampprior":
            u = model.apply(variables, method="get_pseudo_inputs")
            idx = jax.random.randint(k_pick, (n_gen,), 0, u.shape[0])
            m, lv = model.apply(variables, u[idx], method="encode_top")
            z = m + jnp.exp(0.5 * lv) * jax.random.normal(k_z, m.shape)
        else:
            idx = jax.random.randint(k_pick, (n_gen,), 0, n_effective)
            mu = bank_means[idx]
            log_var = clamped_prior_log_var(params, cfg)
            z = mu + jnp.exp(0.5 * log_var) * jax.random.normal(k_z, mu.shape)
        return model.apply(variables, z, k_dec, method="generate_from_top")

    def reference_generate(params, x_ref_raw, key):
        # mirrors train/sampling.py::reference_based_generation_x exactly
        variables = {"params": params}
        k_bin, k_z, k_dec = jax.random.split(key, 3)
        x_ref = preprocess_batch(k_bin, x_ref_raw, input_type=cfg.input_type,
                                 dynamic_binarization=cfg.dynamic_binarization,
                                 train=False)
        mu = model.apply(variables, x_ref, method="encode_top_mean")
        log_var = (clamped_prior_log_var(params, cfg)
                   if cfg.prior == "exemplar_prior" else 0.0)
        z = mu + jnp.exp(0.5 * jnp.asarray(log_var)) * jax.random.normal(
            k_z, mu.shape)
        return model.apply(variables, z, k_dec, method="generate_from_top")

    from exemplar_vae_tpu.train.evaluation import make_iwae_fn
    iwae = make_iwae_fn(model, cfg)

    def score_nll(params, x_chunk_raw, key, bank_means, data_idx, valid):
        bank = Bank(images=None, data_idx=data_idx, valid=valid,
                    cache_means=bank_means, n_effective=n_effective)
        return iwae.chunk_nll(params, x_chunk_raw, key, bank, rounds, r)

    def score_nll_no_bank(params, x_chunk_raw, key):
        return iwae.chunk_nll(params, x_chunk_raw, key, None, rounds, r)

    return generate, reference_generate, (
        score_nll if cfg.prior == "exemplar_prior" else score_nll_no_bank)


def export_serving_bundle(model, cfg: Config, params, out_dir: str, *,
                          bank_means=None, data_idx=None, valid=None,
                          n_effective: Optional[int] = None,
                          n_gen: int = 25, ref_batch: int = 16,
                          score_chunk: int = 16, s_total: int = 64,
                          r: int = 16,
                          platforms: Optional[Sequence[str]] = None) -> dict:
    """Serialize the three serving programs + weights into out_dir.

    For exemplar priors pass the eval bank (means from
    evaluation.make_eval_bank_fn — full bank, no LOO). Returns the
    manifest dict (also written as bundle.json)."""
    from jax import export as jexport

    exemplar = cfg.prior == "exemplar_prior"
    if exemplar:
        assert bank_means is not None and data_idx is not None \
            and valid is not None, "exemplar bundles need the eval bank"
        n_effective = int(n_effective if n_effective is not None
                          else bank_means.shape[0])
    else:
        n_effective = 0
    r = min(r, s_total)
    rounds = max(-(-s_total // r), 1)
    gen_fn, ref_fn, score_fn = make_serving_fns(
        model, cfg, n_effective, n_gen, rounds, r)

    params = jax.device_get(params)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        params)
    c, h, w = (int(s) for s in cfg.input_size)  # reference (C,H,W) order
    img_shape = (h, w, c)                       # the data path is NHWC
    # continuous models (CelebA lineage) are trained/evaluated on RAW uint8
    # with (x + 0.5)/256 dequantization INSIDE preprocess_batch — exporting
    # a float32 input spec would make that branch unreachable in the
    # compiled program and silently score 0..255-scale floats unscaled.
    # binary/gray data arrives as float in [0,1] (loaders pre-divide /255).
    x_dtype = np.uint8 if cfg.input_type == "continuous" else np.float32
    kw = {"platforms": tuple(platforms)} if platforms else {}

    def _ser(fn, *specs):
        return jexport.export(jax.jit(fn), **kw)(*specs).serialize()

    os.makedirs(out_dir, exist_ok=True)
    arrays = {}
    if exemplar:
        bm_spec = jax.ShapeDtypeStruct(bank_means.shape,
                                       np.asarray(bank_means).dtype)
        di_spec = jax.ShapeDtypeStruct(np.shape(data_idx), np.int32)
        va_spec = jax.ShapeDtypeStruct(np.shape(valid), np.bool_)
        gen_bytes = _ser(gen_fn, p_spec, bm_spec, key_spec)
        score_bytes = _ser(
            score_fn, p_spec,
            jax.ShapeDtypeStruct((score_chunk,) + img_shape, x_dtype),
            key_spec, bm_spec, di_spec, va_spec)
        arrays.update(bank_means=np.asarray(bank_means),
                      data_idx=np.asarray(data_idx, np.int32),
                      valid=np.asarray(valid, bool))
    else:
        gen_bytes = _ser(gen_fn, p_spec,
                         jax.ShapeDtypeStruct((0,), np.float32), key_spec)
        score_bytes = _ser(
            score_fn, p_spec,
            jax.ShapeDtypeStruct((score_chunk,) + img_shape, x_dtype),
            key_spec)
    ref_bytes = _ser(
        ref_fn, p_spec,
        jax.ShapeDtypeStruct((ref_batch,) + img_shape, x_dtype), key_spec)

    for name, blob in (("generate", gen_bytes),
                       ("reference_generate", ref_bytes),
                       ("score_nll", score_bytes)):
        with open(os.path.join(out_dir, name + ".bin"), "wb") as f:
            f.write(blob)
    # weights: path-keyed like train/checkpoints.py so drift fails loudly
    from exemplar_vae_tpu.train.checkpoints import _flatten_with_keys
    for k, v in _flatten_with_keys(params):
        arrays["param:" + k] = np.asarray(v)
    np.savez(os.path.join(out_dir, "arrays.npz"), **arrays)
    manifest = {
        "model_name": cfg.model_name, "prior": cfg.prior,
        "input_type": cfg.input_type, "image_shape_nhwc": list(img_shape),
        "x_dtype": np.dtype(x_dtype).name,
        "n_gen": n_gen, "ref_batch": ref_batch, "score_chunk": score_chunk,
        "s_total": s_total, "r": r, "rounds": rounds,
        "n_effective": n_effective,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "config": json.loads(cfg.to_json()),
    }
    with open(os.path.join(out_dir, "bundle.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingBundle:
    """Loaded bundle: replayable compiled programs + weights, no model code.

    >>> b = ServingBundle.load("serving/")
    >>> imgs = b.generate(jax.random.PRNGKey(0))
    >>> nll = b.score_nll(test_images)          # mean + per-point
    """

    def __init__(self, manifest, fns, params, bank):
        self.manifest = manifest
        self._fns = fns
        self.params = params
        self.bank = bank

    @classmethod
    def load(cls, d: str) -> "ServingBundle":
        from jax import export as jexport
        with open(os.path.join(d, "bundle.json")) as f:
            manifest = json.load(f)
        fns = {}
        for name in ("generate", "reference_generate", "score_nll"):
            with open(os.path.join(d, name + ".bin"), "rb") as f:
                # jit the deserialized program ONCE: a bare Exported.call
                # re-traces per invocation (measured +37-50% per-call
                # overhead at ms scales, tools/bench_serving.py); under jit
                # the compiled executable is cached and replay matches the
                # live jit path
                fns[name] = jax.jit(jexport.deserialize(f.read()).call)
        data = np.load(os.path.join(d, "arrays.npz"))
        flat = {k[len("param:"):]: data[k] for k in data.files
                if k.startswith("param:")}
        # rebuild the params dict from path keys ("['dec']['Dense_0']...")
        params = {}
        for k, v in flat.items():
            keys = [s for s in k.replace("']", "").split("['") if s]
            node = params
            for kk in keys[:-1]:
                node = node.setdefault(kk, {})
            node[keys[-1]] = v
        bank = None
        if manifest["prior"] == "exemplar_prior":
            bank = {"bank_means": data["bank_means"],
                    "data_idx": data["data_idx"], "valid": data["valid"]}
        return cls(manifest, fns, params, bank)

    def _prep_x(self, x):
        """Convert user input to the exported program's x spec.

        Continuous bundles were exported for RAW uint8 (the program
        dequantizes (x + 0.5)/256 internally, matching the live eval
        protocol) — casting floats to uint8 silently would corrupt data,
        so non-uint8 input is rejected. Binary/gray bundles take floats in
        [0,1]; raw uint8 is scaled by /255 exactly like the live loaders
        (ops/preprocess.to_float)."""
        x = np.asarray(x)
        if self.manifest.get("x_dtype", "float32") == "uint8":
            if x.dtype != np.uint8:
                raise ValueError(
                    f"this bundle (input_type="
                    f"{self.manifest['input_type']!r}) was exported for "
                    f"raw uint8 images; got dtype {x.dtype} — pass the "
                    f"undecoded uint8 array, the program dequantizes "
                    f"internally")
            return x
        if x.dtype == np.uint8:
            return x.astype(np.float32) / 255.0
        return x.astype(np.float32)

    def generate(self, key):
        bm = (self.bank["bank_means"] if self.bank is not None
              else np.zeros((0,), np.float32))
        return self._fns["generate"](self.params, bm, key)

    def reference_generate(self, x_ref, key):
        assert x_ref.shape[0] == self.manifest["ref_batch"], \
            f"exported for batch {self.manifest['ref_batch']}"
        return self._fns["reference_generate"](
            self.params, self._prep_x(x_ref), key)

    def score_nll(self, x, key=None):
        """Mean + per-point IWAE NLL; loops fixed-shape chunks, padding the
        tail (padded rows are scored and discarded)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        chunk = self.manifest["score_chunk"]
        x = self._prep_x(x)
        n = x.shape[0]
        outs = []
        for i, start in enumerate(range(0, n, chunk)):
            xc = x[start:start + chunk]
            true = xc.shape[0]
            if true < chunk:
                xc = np.concatenate(
                    [xc, np.zeros((chunk - true,) + xc.shape[1:],
                                  xc.dtype)], 0)
            k = jax.random.fold_in(key, i)
            if self.bank is not None:
                o = self._fns["score_nll"](
                    self.params, xc, k, self.bank["bank_means"],
                    self.bank["data_idx"], self.bank["valid"])
            else:
                o = self._fns["score_nll"](self.params, xc, k)
            outs.append(np.asarray(o)[:true])
        per = np.concatenate(outs)
        return float(per.mean()), per
