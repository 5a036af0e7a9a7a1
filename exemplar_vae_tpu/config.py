"""Experiment configuration.

The reference threads an argparse ``args`` namespace through every layer
(reference: main.py::parser [U], SURVEY.md §5 "config / flag system").
Here the single source of truth is a frozen dataclass; ``main.py`` provides a
CLI shim that accepts the reference's flag names verbatim so existing launch
commands keep working.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class Config:
    # --- experiment selection (reference: main.py flags [U]) ---
    dataset_name: str = "dynamic_mnist"  # static_mnist | dynamic_mnist | fashion_mnist | omniglot | celeba | synthetic*
    model_name: str = "vae"              # vae | hvae_2level | convhvae_2level
    prior: str = "exemplar_prior"        # standard | vampprior | exemplar_prior

    # --- architecture ---
    z1_size: int = 40
    z2_size: int = 40
    hidden_size: int = 300
    # input metadata — normally set by the data loader, not the user
    input_size: Tuple[int, int, int] = (1, 28, 28)
    input_type: str = "binary"           # binary | gray | continuous
    dynamic_binarization: bool = True
    # explicit user override of the per-dataset default (None = use dataset meta)
    dynamic_binarization_override: "Optional[bool]" = None

    # --- prior parameters ---
    number_components: int = 50_000      # exemplar-set size N (vamp: #pseudo-inputs)
    approximate_prior: bool = False      # use the kNN-subsampled exemplar prior
    approximate_k: int = 10              # K nearest cached exemplars per batch point
    # Approximate-prior SUPPORT-SET semantics (SURVEY.md §3.5 ambiguity;
    # round-2 VERDICT missing #3). 'per_row' (default): each batch point's
    # mixture runs over its OWN K re-encoded neighbors — the paper's
    # per-point kNN formulation (arXiv:2004.04795 §3.2). 'batch_union':
    # every point's mixture runs over the union of ALL B*K selected
    # exemplars (duplicates counted once) — a tighter lower bound (each
    # point's own K is a subset of the union), costlier by a (B, B*K)
    # pairwise pass; re-encode cost is identical. Both use the full-set
    # denominator. Session-0 verify item: which one get_exemplar_set
    # implements (docs/DESIGN.md §5 has the A/B numbers).
    approximate_support: str = "per_row"  # per_row | batch_union
    prior_variance_init: float = 1.0     # init for the learned shared sigma^2
    # Opt-in floor for the learned prior variance (0 = off, bit-identical
    # to the plain [-8, 8] overflow clamp). NOTE (round-3, measured): the
    # sigma_floor_demo falsified the round-2 hypothesis that shrinking
    # prior sigma^2 drives the late-training divergence — with the floor
    # binding at 0.05 the run still blew up 2 epochs later. The measured
    # mechanism (sigma_collapse_diag.json, DESIGN.md §4b) is an ENCODER
    # runaway: q_logvar saturates at its -6 hardtanh (zero gradient),
    # then encoder means grow unboundedly until distance^2/sigma^2
    # overflows fp32 in the prior gradient. Measured outcome: neither this
    # floor, nor q_logvar_min, nor both, nor plain Adam prevents the
    # divergence (each shifts the onset; DESIGN.md §4b 5-arm matrix) —
    # containment (abort + best-on-val) is the working mitigation.
    prior_var_min: float = 0.0
    # Opt-in raise of the inference-net log-variance clamp floor
    # (reference hardtanh(-6, 2); -6.0 = off, bit-identical). Measured
    # (sigma_floor_demo.json): like every other knob, this SHIFTS the
    # divergence onset on the pathological synthetic config but does not
    # prevent it — the objective is unbounded there (GMM likelihood
    # singularity on near-duplicate exemplars; DESIGN.md §4b has the full
    # 5-arm matrix). Containment (non-finite abort + best-on-val) is the
    # real mitigation; these knobs exist for experimentation.
    q_logvar_min: float = -6.0
    no_mask: bool = False                # disable leave-one-out masking (debug flag)
    use_training_data_init: bool = False # vamp pseudo-input init from data
    # Exemplar-BANK preprocessing convention. False (default, reference
    # behavior [M]): the bank is encoded from the loader-held tensors —
    # gray levels for dynamically-binarized datasets, (x+0.5)/256 for
    # continuous — deterministically, at train AND eval (the reference's
    # cache_z / exemplar embedding encodes the dataset tensors directly;
    # only the training BATCH gets the fresh per-step Bernoulli/dequant
    # draw [U]). True: per-epoch stochastic bank preprocessing (ablation).
    bank_stochastic_preprocess: bool = False

    # --- ConvHVAE architecture spec (SURVEY.md §0.2 marks the reference's
    # channel counts [M]; the stack below is the rebuild's documented guess,
    # externalized so the session-0 correction — once the reference mount
    # populates — is a config edit, not code surgery; docs/DESIGN.md §4
    # session-0 checklist). Grammar: comma-separated layers, each
    # [t|c]<features>k<kernel>s<stride>; 't' = GatedConvTranspose2d,
    # 'c' (default) = GatedConv2d. Encoder downsampling (product of enc
    # strides) must equal decoder upsampling (product of 't' strides).
    conv_enc_spec: str = "32k7s1,32k3s2,64k5s1,64k3s2"
    conv_dec_spec: str = "t64k3s2,t32k3s2,c32k3s1"
    conv_proj_channels: int = 64         # bottleneck channels of the decoder projection
    # PixelHVAE decoder stack (beyond-parity family; externalized like the
    # conv spec so deepening toward the upstream PixelCNN is a config edit)
    pixelcnn_features: int = 64
    pixelcnn_layers: int = 4

    # --- optimization (reference defaults, SURVEY.md §0.1) ---
    optimizer: str = "adam_norm_grad"    # adam_norm_grad (reference) | adam
    lr: float = 5e-4
    batch_size: int = 100
    test_batch_size: int = 100
    epochs: int = 2000
    warmup: int = 100                    # beta ramps 0->1 over this many epochs
    early_stopping_epochs: int = 50
    seed: int = 14

    # --- evaluation ---
    S: int = 5000                        # importance samples for test NLL
    MB: int = 500                        # importance-sample chunk size

    # --- TPU-native knobs (no reference equivalent) ---
    mesh_shape: Tuple[int, ...] = (1,)   # data-parallel mesh ('data',)
    mesh_axes: Tuple[str, ...] = ("data",)
    compute_dtype: str = "float32"       # bfloat16 for throughput runs
    use_pallas_prior: bool = True        # tiled Pallas pairwise-LSE kernel
    prior_block_n: int = 2048            # exemplar-axis tile for blockwise prior
    exact_reencode_chunk: int = 8192     # bank re-encode chunk (memory control)
    exact_remat: bool = True             # remat the bank encode (memory vs FLOPs)
    # remat the approximate mode's fresh B*K neighbor re-encode: the conv
    # activations saved for its backward are the epoch program's largest
    # transient at CelebA scale (DESIGN.md §8g); recomputing them in the
    # backward trades ~one extra encoder forward for GBs of HBM. Values are
    # bitwise-identical either way (CI-pinned). Default off: at config-3
    # scale the activations fit easily and remat only costs FLOPs.
    approx_remat: bool = False
    donate_state: bool = True
    # epoch-batch gather placement: "auto" gathers each step's B rows from
    # the device-resident train_x INSIDE the epoch scan (no epoch-sized HBM
    # copy, DESIGN.md §8f) unless train_x exceeds ~2^31 elements, where the
    # round-3 pre-materialized epoch tensor is kept (the in-scan variant
    # has no track record at that scale — DESIGN.md §8g). "in_scan" /
    # "pregather" force either path (CI pins their equality).
    gather_in_scan: str = "auto"
    # split the compiled epoch into this many shorter scans, executed
    # back-to-back by the trainer (DESIGN.md §8g "next lever"). Shrinks the
    # live range of the per-epoch transients — in pregather mode the
    # materialized epoch tensor becomes 1/K dataset-sized; in in-scan mode
    # the program itself is 1/K as long, so XLA's relaid-out gather copies
    # of train_x live over a shorter span. Values are bitwise-identical to
    # a single scan (per-step PRNG keys fold the GLOBAL step index; the
    # chunks share one compiled executable). 0 = auto: 1 normally, 4 when
    # train_x exceeds ~2^31 elements (the config-4 regime that faults a
    # single 16 GB chip, DESIGN.md §8g).
    epoch_splits: int = 0

    # --- infrastructure ---
    data_dir: str = "datasets"
    snapshot_dir: str = "snapshots"
    training_set_size: int = 50_000      # carve-out; synthetic fallback honors it
    val_set_size: int = 10_000
    test_set_size: int = 10_000
    checkpoint_every: int = 0            # epochs; 0 = only best/final
    checkpoint_backend: str = "npz"      # npz (simple) | orbax (async, multi-host)
    resume: bool = False
    eval_only: bool = False              # restore a checkpoint, skip
                                         # training, run final_evaluation
                                         # (re-score at a different --S
                                         # without retraining)
    debug_nans: bool = False             # NaN sanitizer (jax_debug_nans)
    profile_epoch: int = 0               # capture a jax.profiler trace of this epoch

    def __post_init__(self):
        # enum-ish fields used via `== value` checks downstream: a typo'd
        # programmatic Config (e.g. approximate_support='batch-union')
        # would otherwise silently run the default branch
        _choices = {
            "approximate_support": ("per_row", "batch_union"),
            "prior": ("standard", "vampprior", "exemplar_prior"),
            "input_type": ("binary", "gray", "continuous"),
            "checkpoint_backend": ("npz", "orbax"),
            "compute_dtype": ("float32", "bfloat16"),
            "gather_in_scan": ("auto", "in_scan", "pregather"),
        }
        for field, allowed in _choices.items():
            v = getattr(self, field)
            if v not in allowed:
                raise ValueError(f"Config.{field}={v!r}; expected one of "
                                 f"{allowed}")
        if self.val_set_size <= 0:
            raise ValueError(
                f"Config.val_set_size={self.val_set_size}; the protocol "
                f"needs a validation split (early stopping and best-on-val "
                f"selection both ride it — SURVEY.md §0.4)")
        if self.epoch_splits < 0:
            raise ValueError(
                f"Config.epoch_splits={self.epoch_splits}; must be >= 0 "
                f"(0 = auto, k = split the epoch into k compiled scans)")
        if self.prior_block_n <= 0:
            raise ValueError(
                f"Config.prior_block_n={self.prior_block_n}; must be "
                f"positive (the exemplar-axis tile of the blockwise prior; "
                f"multiples of 128 required for the TPU Pallas kernel)")

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # --- derived ---
    @property
    def input_dim(self) -> int:
        c, h, w = self.input_size
        return c * h * w

    @property
    def loo_mask_enabled(self) -> bool:
        return self.prior == "exemplar_prior" and not self.no_mask

    # fields that do NOT change what is being trained — excluded from the
    # experiment-dir digest so e.g. bumping --epochs and resuming lands in
    # the SAME directory (found via /verify: --resume silently started
    # fresh in a new dir when --epochs changed)
    _VOLATILE_FIELDS = frozenset({
        "epochs", "early_stopping_epochs", "S", "MB", "test_batch_size",
        "mesh_shape", "mesh_axes", "compute_dtype", "use_pallas_prior",
        "prior_block_n", "exact_reencode_chunk", "exact_remat", "approx_remat",
        "donate_state", "gather_in_scan", "epoch_splits",
        "data_dir", "snapshot_dir", "checkpoint_every", "checkpoint_backend",
        "resume", "eval_only", "debug_nans", "profile_epoch",
    })

    def experiment_name(self) -> str:
        """Directory name derived from flag values (reference behavior:
        main.py builds the snapshot dir from args [U]). The digest covers
        only run-identity fields, not infra/eval knobs."""
        core = (
            f"{self.dataset_name}_{self.model_name}_{self.prior}"
            f"_K{self.number_components}"
            f"_wu{self.warmup}_z1{self.z1_size}_z2{self.z2_size}"
        )
        if self.prior == "exemplar_prior" and self.approximate_prior:
            core += f"_approxK{self.approximate_k}"
        ident = {k: v for k, v in dataclasses.asdict(self).items()
                 if k not in self._VOLATILE_FIELDS}
        digest = hashlib.md5(
            json.dumps(ident, sort_keys=True, default=str).encode()
        ).hexdigest()[:6]
        return f"{core}_s{self.seed}_{digest}"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        for k in ("input_size", "mesh_shape", "mesh_axes"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return Config(**d)


def parse_conv_spec(spec: str):
    """Parse a conv-stack spec string into (kind, features, kernel, stride)
    tuples. Grammar per layer: ``[t|c]<features>k<kernel>s<stride>``."""
    import re
    out = []
    for part in spec.split(","):
        part = part.strip()
        m = re.fullmatch(r"([tc]?)(\d+)k(\d+)s(\d+)", part)
        if not m:
            raise ValueError(
                f"bad conv-spec layer {part!r} (want [t|c]<feat>k<k>s<s>)")
        kind = m.group(1) or "c"
        out.append((kind, int(m.group(2)), int(m.group(3)), int(m.group(4))))
    return tuple(out)


def reference_arg_parser():
    """argparse parser accepting the reference's flag names
    (reference: main.py::parser [U]; SURVEY.md §5 flag list)."""
    import argparse

    p = argparse.ArgumentParser(description="exemplar_vae_tpu")
    d = Config()
    p.add_argument("--dataset_name", type=str, default=d.dataset_name)
    p.add_argument("--model_name", type=str, default=d.model_name)
    p.add_argument("--prior", type=str, default=d.prior,
                   choices=["standard", "vampprior", "exemplar_prior"])
    p.add_argument("--number_components", type=int, default=d.number_components)
    p.add_argument("--approximate_prior", action="store_true")
    p.add_argument("--approximate_k", type=int, default=d.approximate_k)
    p.add_argument("--approximate_support", type=str,
                   default=d.approximate_support,
                   choices=["per_row", "batch_union"])
    p.add_argument("--prior_variance", type=float, default=d.prior_variance_init)
    p.add_argument("--prior_var_min", type=float, default=d.prior_var_min,
                   help="floor for the learned prior sigma^2 (0 = off); "
                        "opt-in curvature cap, DESIGN.md §4b")
    p.add_argument("--q_logvar_min", type=float, default=d.q_logvar_min,
                   help="inference-net log-var clamp floor (-6 = reference "
                        "hardtanh); experimentation knob, DESIGN.md §4b")
    p.add_argument("--no_mask", action="store_true")
    p.add_argument("--use_training_data_init", action="store_true")
    p.add_argument("--z1_size", type=int, default=d.z1_size)
    p.add_argument("--z2_size", type=int, default=d.z2_size)
    p.add_argument("--hidden_size", type=int, default=d.hidden_size)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--test_batch_size", type=int, default=d.test_batch_size)
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--optimizer", type=str, default=d.optimizer,
                   choices=["adam_norm_grad", "adam"],
                   help="adam_norm_grad is the reference optimizer; adam is "
                        "the variance-reduced harness mode")
    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--warmup", type=int, default=d.warmup)
    p.add_argument("--early_stopping_epochs", type=int, default=d.early_stopping_epochs)
    p.add_argument("--S", type=int, default=d.S)
    p.add_argument("--MB", type=int, default=d.MB)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--training_set_size", type=int, default=d.training_set_size)
    p.add_argument("--no_cuda", action="store_true",
                   help="accepted for reference CLI compatibility; ignored (TPU/CPU chosen by JAX)")
    p.add_argument("--dynamic_binarization", action="store_true", default=None)
    p.add_argument("--conv_enc_spec", type=str, default=d.conv_enc_spec,
                   help="ConvHVAE encoder stack, e.g. '32k7s1,32k3s2,...'")
    p.add_argument("--conv_dec_spec", type=str, default=d.conv_dec_spec,
                   help="ConvHVAE decoder stack, 't'=transpose conv")
    p.add_argument("--conv_proj_channels", type=int, default=d.conv_proj_channels)
    p.add_argument("--pixelcnn_features", type=int, default=d.pixelcnn_features,
                   help="PixelHVAE masked-conv stack width")
    p.add_argument("--pixelcnn_layers", type=int, default=d.pixelcnn_layers,
                   help="PixelHVAE masked-conv stack depth (mask-B layers)")
    # TPU-native extras
    p.add_argument("--mesh", type=str, default=None,
                   help="comma-separated mesh shape over ('data',), e.g. '8'")
    p.add_argument("--compute_dtype", type=str, default=d.compute_dtype)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--data_dir", type=str, default=d.data_dir)
    p.add_argument("--snapshot_dir", type=str, default=d.snapshot_dir)
    p.add_argument("--val_set_size", type=int, default=d.val_set_size)
    p.add_argument("--test_set_size", type=int, default=d.test_set_size)
    p.add_argument("--checkpoint_every", type=int, default=d.checkpoint_every)
    p.add_argument("--checkpoint_backend", type=str,
                   default=d.checkpoint_backend, choices=["npz", "orbax"])
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval_only", action="store_true",
                   help="restore the final/last checkpoint, skip training, "
                        "run the final IWAE eval + artifacts (honors --S)")
    p.add_argument("--epoch_splits", type=int, default=d.epoch_splits,
                   help="split the compiled epoch into k shorter scans "
                        "(HBM live-range knob, bitwise-identical values; "
                        "0 = auto)")
    p.add_argument("--approx_remat", action="store_true",
                   help="remat the approximate mode's B*K neighbor "
                        "re-encode (HBM vs FLOPs; bitwise-identical values)")
    p.add_argument("--debug_nans", action="store_true",
                   help="raise at the op producing any NaN inside jit")
    p.add_argument("--profile_epoch", type=int, default=0,
                   help="capture a jax.profiler trace of this epoch")
    return p


def config_from_args(ns) -> Config:
    """Translate a reference-style argparse namespace into a Config."""
    kw = dict(
        dataset_name=ns.dataset_name,
        model_name=ns.model_name.lower(),
        prior=ns.prior,
        number_components=ns.number_components,
        approximate_prior=ns.approximate_prior,
        approximate_k=ns.approximate_k,
        approximate_support=ns.approximate_support,
        prior_variance_init=ns.prior_variance,
        prior_var_min=ns.prior_var_min,
        q_logvar_min=ns.q_logvar_min,
        no_mask=ns.no_mask,
        use_training_data_init=ns.use_training_data_init,
        z1_size=ns.z1_size,
        z2_size=ns.z2_size,
        hidden_size=ns.hidden_size,
        conv_enc_spec=ns.conv_enc_spec,
        conv_dec_spec=ns.conv_dec_spec,
        conv_proj_channels=ns.conv_proj_channels,
        pixelcnn_features=ns.pixelcnn_features,
        pixelcnn_layers=ns.pixelcnn_layers,
        batch_size=ns.batch_size,
        test_batch_size=ns.test_batch_size,
        lr=ns.lr,
        optimizer=ns.optimizer,
        epochs=ns.epochs,
        warmup=ns.warmup,
        early_stopping_epochs=ns.early_stopping_epochs,
        S=ns.S,
        MB=ns.MB,
        seed=ns.seed,
        training_set_size=ns.training_set_size,
        val_set_size=ns.val_set_size,
        test_set_size=ns.test_set_size,
        compute_dtype=ns.compute_dtype,
        use_pallas_prior=not ns.no_pallas,
        data_dir=ns.data_dir,
        snapshot_dir=ns.snapshot_dir,
        checkpoint_every=ns.checkpoint_every,
        checkpoint_backend=ns.checkpoint_backend,
        resume=ns.resume,
        eval_only=ns.eval_only,
        approx_remat=ns.approx_remat,
        epoch_splits=ns.epoch_splits,
        debug_nans=ns.debug_nans,
        profile_epoch=ns.profile_epoch,
    )
    if ns.mesh is not None:
        kw["mesh_shape"] = tuple(int(x) for x in ns.mesh.split(","))
    if ns.dynamic_binarization is not None:
        kw["dynamic_binarization_override"] = ns.dynamic_binarization
    return Config(**kw)
