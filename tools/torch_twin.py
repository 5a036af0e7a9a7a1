"""Trainable PyTorch twin of the flagship VAE + exact exemplar prior.

From-scratch re-expression of the reference's full training/eval math in
torch (the behavioral contract of SURVEY.md §0.1 — nothing is copied; the
reference mount is empty). tools/parity_trajectory.py drives this twin and
the JAX framework through the SAME multi-epoch training trajectory on
identical data and identical noise and compares per-epoch val-ELBO, final
IWAE NLL, and parameter trajectories — the pre-real-data de-risk of the
0.1-nat parity target (round-1 VERDICT, next-round item 1).

Everything the reference trajectory exercises is here, independently:
  encoder -> reparameterize -> decoder -> Bernoulli RE -> log q
  -> exact exemplar prior (full-bank re-encode, LOO mask, N-1 denominator)
  -> loss = -RE + beta * KL -> backward
  -> AdamNormGrad (per-tensor grad L2 normalization, then Adam)
  -> per-epoch val ELBO (full bank, no LOO, denominator N)
  -> IWAE test NLL (importance samples in rounds, online over rounds).

Parameters are kept in the flax layout ((in, out) kernels; gated layers
carry SEPARATE h_kernel/g_kernel (+biases) like the reference's two Linear
modules — AdamNormGrad's per-tensor normalization depends on that
granularity) so weights copy across without transposition ambiguity. All
math is fp32, like the JAX side. The AdamNormGrad mode implements the
reference's OLD-TORCH update (denom = sqrt(v)+eps, step scaled by
sqrt(1-b2^t)/(1-b1^t)) — NOT torch.optim.Adam, whose modern eps placement
differs (train/optimizer.py::scale_by_reference_adam).
"""

from __future__ import annotations

import math

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = np.asarray(v)
    return out


class TorchTwin:
    """Functional torch model over a flat dict of flax-layout parameters."""

    def __init__(self, flax_params, lr=5e-4, betas=(0.9, 0.999),
                 adam_eps=1e-8, norm_eps=1e-7, norm_grads=True,
                 approximate_k=None):
        import torch

        self.torch = torch
        self.norm_eps = norm_eps
        # norm_grads=False -> plain Adam (the variance-reduced parity mode,
        # matching train/optimizer.py::plain_adam)
        self.norm_grads = norm_grads
        # approximate_k -> TRAIN-time kNN prior over a stale per-epoch cache
        # (reference cache_z/get_exemplar_set semantics, SURVEY.md §3.5);
        # eval stays exact. Caller refreshes via refresh_cache() per epoch.
        self.approximate_k = approximate_k
        self.cache = None
        self.p = {k: torch.tensor(v, dtype=torch.float32, requires_grad=True)
                  for k, v in _flatten(flax_params).items()}
        self.z_dim = self._resolve_z_dim()
        if self.norm_grads:
            # reference AdamNormGrad: hand-rolled old-torch Adam update
            self.lr, self.b1, self.b2, self.adam_eps = (lr, betas[0],
                                                        betas[1], adam_eps)
            self._step_t = 0
            self._m = {k: torch.zeros_like(t) for k, t in self.p.items()}
            self._v = {k: torch.zeros_like(t) for k, t in self.p.items()}
            self.opt = None
        else:
            # plain-Adam variance-reduced mode mirrors optax.scale_by_adam
            # (modern eps placement) — train/optimizer.py::plain_adam
            self.opt = torch.optim.Adam(list(self.p.values()), lr=lr,
                                        betas=betas, eps=adam_eps)

    def _resolve_z_dim(self):
        return self.p["q_mean_head/kernel"].shape[1]

    # mixture denominators (overridden by the vamp twin: always log C)
    def train_log_denom(self, n_bank):
        return math.log(n_bank - 1)       # LOO removes one component

    def eval_log_denom(self, n_bank):
        return math.log(n_bank)

    # ---------------- model pieces (flax layout: y = x @ W + b) -----------
    def _dense(self, x, name):
        return x @ self.p[f"{name}/kernel"] + self.p[f"{name}/bias"]

    def _gated(self, x, name):
        h = x @ self.p[f"{name}/h_kernel"] + self.p[f"{name}/h_bias"]
        g = x @ self.p[f"{name}/g_kernel"] + self.p[f"{name}/g_bias"]
        return h * self.torch.sigmoid(g)

    def encode(self, x2d):
        h = self._gated(x2d, "q_layers_0")
        h = self._gated(h, "q_layers_1")
        mean = self._dense(h, "q_mean_head")
        logvar = self.torch.clamp(self._dense(h, "q_logvar_head/Dense_0"),
                                  -6.0, 2.0)
        return mean, logvar

    def decode_probs(self, z):
        h = self._gated(z, "p_layers_0")
        h = self._gated(h, "p_layers_1")
        return self.torch.sigmoid(self._dense(h, "p_mean_head/Dense_0"))

    # ---------------- objective terms ------------------------------------
    def _re_bernoulli(self, x2d, probs):
        pc = probs.clamp(1e-5, 1.0 - 1e-5)
        return (x2d * pc.log() + (1.0 - x2d) * (1.0 - pc).log()).sum(-1)

    def _log_q(self, z, mean, logvar):
        return (-0.5 * (logvar + (z - mean) ** 2 / logvar.exp())).sum(-1)

    def refresh_cache(self, bank):
        """Per-epoch stale-cache refresh (reference cache_z [U]): encode the
        whole bank with the CURRENT params, no grad. Call at epoch start —
        the cache then lags the encoder by up to one epoch, exactly like
        train/trainer.py::train_epoch's cache_refresh placement."""
        torch = self.torch
        with torch.no_grad():
            bank2d = torch.tensor(
                np.asarray(bank, np.float32).reshape(len(bank), -1))
            self.cache, _ = self.encode(bank2d)
        return self.cache

    def _knn_select(self, q_mean):
        """Per-row K nearest stale-cache entries. Distances use the SAME
        expansion as ops/knn.py::pairwise_sq_dist (q^2 + b^2 - 2 q.b, fp32,
        clamped at 0) so near-tie decisions match the JAX side bit-for-bit
        where the fp32 arithmetic does; EXACT ties break to the LOWEST
        index (np stable argsort), pinning lax.top_k's documented tie-break
        (tests/test_knn_and_preprocess.py duplicate-distance pin)."""
        torch = self.torch
        with torch.no_grad():
            q = q_mean.detach().float()
            qs = (q * q).sum(-1, keepdim=True)
            bs = (self.cache * self.cache).sum(-1)[None, :]
            d = torch.clamp(qs + bs - 2.0 * (q @ self.cache.T), min=0.0)
            idx = np.argsort(d.numpy(), axis=1,
                             kind="stable")[:, :self.approximate_k]
        return torch.tensor(idx, dtype=torch.long)

    def _log_p_exemplar(self, z, bank2d, data_idx, bank_idx, log_denom,
                        q_mean=None, train=False):
        """Exemplar prior. Exact mode: differentiable full-bank re-encode,
        pairwise isotropic log-normal, optional LOO mask, logsumexp.
        Approximate TRAIN mode (approximate_k set): per-row kNN over the
        stale cache -> fresh differentiable re-encode of each point's K
        neighbors -> per-row mixture with the FULL-set denominator and the
        LOO mask on global indices (models/base.py::rows_exemplar_log_prob,
        train/loss.py approx branch)."""
        torch = self.torch
        lv = self.p["prior_log_var"]
        if train and self.approximate_k is not None:
            idx = self._knn_select(q_mean)                       # (B, K)
            sel = bank2d[idx.reshape(-1)]                        # (B*K, X)
            mean_sel, _ = self.encode(sel)                       # fresh, grad
            mean_bk = mean_sel.reshape(idx.shape[0], idx.shape[1], -1)
            sq = ((z[:, None, :] - mean_bk) ** 2).sum(-1)        # (B, K)
            logits = -0.5 * (self.z_dim * lv + sq * torch.exp(-lv))
            if data_idx is not None:
                ex_idx = bank_idx[idx]                           # (B, K)
                logits = logits.masked_fill(ex_idx == data_idx[:, None],
                                            -1e30)
            return torch.logsumexp(logits, dim=-1) - log_denom
        bank_mean, _ = self.encode(bank2d)
        sq = torch.cdist(z, bank_mean) ** 2
        logits = -0.5 * (self.z_dim * lv + sq * torch.exp(-lv))
        if data_idx is not None:
            mask = data_idx[:, None] == bank_idx[None, :]
            logits = logits.masked_fill(mask, -1e30)
        return torch.logsumexp(logits, dim=-1) - log_denom

    def elbo_terms(self, x2d, eps, bank2d, data_idx, bank_idx, log_denom,
                   train=False):
        """-> (RE, KL) per example, with injected reparam noise eps."""
        q_mean, q_logvar = self.encode(x2d)
        z = q_mean + self.torch.exp(0.5 * q_logvar) * eps
        re = self._re_bernoulli(x2d, self.decode_probs(z))
        log_q = self._log_q(z, q_mean, q_logvar)
        log_p = self._log_p_exemplar(z, bank2d, data_idx, bank_idx, log_denom,
                                     q_mean=q_mean, train=train)
        return re, log_q - log_p

    # ---------------- training / evaluation ------------------------------
    def train_step(self, x, idx, bank, eps, beta, n_bank):
        """One AdamNormGrad step; x/bank NHWC float arrays, eps (B, Z)."""
        torch = self.torch
        x2d = torch.tensor(np.asarray(x, np.float32).reshape(len(x), -1))
        bank2d = torch.tensor(
            np.asarray(bank, np.float32).reshape(len(bank), -1))
        re, kl = self.elbo_terms(
            x2d, torch.tensor(np.asarray(eps, np.float32)), bank2d,
            torch.tensor(np.asarray(idx, np.int64)),
            torch.arange(len(bank)), self.train_log_denom(n_bank),
            train=True)
        loss = (-re + beta * kl).mean()
        for t in self.p.values():
            t.grad = None
        loss.backward()
        if self.norm_grads:
            # reference AdamNormGrad step: per-tensor L2 normalization, then
            # the old-torch Adam form (module docstring)
            self._step_t += 1
            t_ = self._step_t
            step_size = (self.lr * (1 - self.b2 ** t_) ** 0.5
                         / (1 - self.b1 ** t_))
            with torch.no_grad():
                for k, t in self.p.items():
                    if t.grad is None:
                        continue
                    g = t.grad / (t.grad.norm() + self.norm_eps)
                    self._m[k].mul_(self.b1).add_(g, alpha=1 - self.b1)
                    self._v[k].mul_(self.b2).addcmul_(g, g,
                                                      value=1 - self.b2)
                    t.sub_(step_size * self._m[k]
                           / (self._v[k].sqrt() + self.adam_eps))
        else:
            self.opt.step()
        return float(loss.detach())

    def val_elbo(self, x, eps, bank, n_bank):
        """Mean validation loss (-RE + KL), full bank, no LOO, denom N."""
        torch = self.torch
        with torch.no_grad():
            x2d = torch.tensor(np.asarray(x, np.float32).reshape(len(x), -1))
            bank2d = torch.tensor(
                np.asarray(bank, np.float32).reshape(len(bank), -1))
            re, kl = self.elbo_terms(
                x2d, torch.tensor(np.asarray(eps, np.float32)), bank2d,
                None, None, self.eval_log_denom(n_bank))
            return (float((-re + kl).mean()), float((-re).mean()),
                    float(kl.mean()))

    def iwae_chunk(self, x, eps_rounds, bank, n_bank):
        """Per-point NLL for one test chunk. eps_rounds: (rounds, T*R, Z);
        importance weights a = RE - KL, online-LSE over rounds like the JAX
        estimator (train/evaluation.py)."""
        torch = self.torch
        with torch.no_grad():
            t = len(x)
            rounds, tr, _ = eps_rounds.shape
            r = tr // t
            x2d = torch.tensor(np.asarray(x, np.float32).reshape(t, -1))
            x_rep = x2d.repeat_interleave(r, dim=0)
            bank2d = torch.tensor(
                np.asarray(bank, np.float32).reshape(len(bank), -1))
            m = torch.full((t,), -1e30)
            s = torch.zeros(t)
            for j in range(rounds):
                re, kl = self.elbo_terms(
                    x_rep, torch.tensor(np.asarray(eps_rounds[j], np.float32)),
                    bank2d, None, None, self.eval_log_denom(n_bank))
                a = (re - kl).reshape(t, r)
                m_new = torch.maximum(m, a.max(dim=1).values)
                s = s * torch.exp(m - m_new) + torch.exp(
                    a - m_new[:, None]).sum(dim=1)
                m = m_new
            log_px = m + s.log() - math.log(rounds * r)
            return (-log_px).numpy()

    def snapshot(self):
        return {k: v.detach().clone() for k, v in self.p.items()}

    def load_snapshot(self, snap):
        with self.torch.no_grad():
            for k, v in snap.items():
                self.p[k].copy_(v)

    def params_numpy(self):
        return {k: v.detach().numpy().copy() for k, v in self.p.items()}


class TorchTwinVamp(TorchTwin):
    """Trainable torch twin of the VAE with the VAMP prior: a mixture over
    C learned pseudo-inputs (parameters, hardtanh-clamped to [0,1] at use)
    re-encoded by the current encoder with per-component DIAGONAL
    variances (models/base.py::log_p_z_top vamp branch). The bank args of
    the shared train/eval drivers are ignored; log_denom carries log(C)."""

    def _log_p_exemplar(self, z, bank2d, data_idx, bank_idx, log_denom,
                        q_mean=None, train=False):
        torch = self.torch
        u = torch.clamp(self.p["pseudo_inputs"], 0.0, 1.0)
        u2d = u.reshape(u.shape[0], -1)
        mu, lv = self.encode(u2d)                          # (C, Z) each
        # per-component diagonal log-normal, summed over Z
        diff = z[:, None, :] - mu[None]                    # (B, C, Z)
        lp = (-0.5 * (lv[None] + diff ** 2 / lv.exp()[None])).sum(-1)
        return torch.logsumexp(lp, dim=-1) - log_denom

    def train_log_denom(self, n_bank):
        return math.log(self.p["pseudo_inputs"].shape[0])  # no LOO for vamp

    def eval_log_denom(self, n_bank):
        return math.log(self.p["pseudo_inputs"].shape[0])


class TorchTwinHVAE(TorchTwin):
    """Trainable torch twin of the 2-level MLP HVAE (models/hvae.py):
    q(z2|x) q(z1|x,z2); p(z2)=exemplar prior, p(z1|z2), p(x|z1,z2); the
    sampled level-1 KL term E_q[log q(z1|x,z2) - log p(z1|z2)] rides inside
    KL exactly like ForwardOut.extra_kl. Injected noise is (eps2, eps1) —
    the JAX side's __call__ splits its key into (k2, k1) in that order."""

    def _resolve_z_dim(self):
        return self.p["q_z2_mean_head/kernel"].shape[1]

    # q(z2 | x) — the exemplar-prior encoder
    def encode(self, x2d):
        h = self._gated(x2d, "q_z2_layers_0")
        h = self._gated(h, "q_z2_layers_1")
        mean = self._dense(h, "q_z2_mean_head")
        logvar = self.torch.clamp(self._dense(h, "q_z2_logvar_head/Dense_0"),
                                  -6.0, 2.0)
        return mean, logvar

    def _q_z1(self, x2d, z2):
        hx = self._gated(x2d, "q_z1_x")
        hz = self._gated(z2, "q_z1_z2")
        h = self._gated(self.torch.cat([hx, hz], -1), "q_z1_joint")
        mean = self._dense(h, "q_z1_mean_head")
        logvar = self.torch.clamp(self._dense(h, "q_z1_logvar_head/Dense_0"),
                                  -6.0, 2.0)
        return mean, logvar

    def _p_z1(self, z2):
        h = self._gated(z2, "p_z1_layers_0")
        h = self._gated(h, "p_z1_layers_1")
        mean = self._dense(h, "p_z1_mean_head")
        logvar = self.torch.clamp(self._dense(h, "p_z1_logvar_head/Dense_0"),
                                  -6.0, 2.0)
        return mean, logvar

    def decode_probs(self, z1, z2):
        h1 = self._gated(z1, "p_x_z1")
        h2 = self._gated(z2, "p_x_z2")
        h = self._gated(self.torch.cat([h1, h2], -1), "p_x_joint")
        return self.torch.sigmoid(self._dense(h, "p_x_mean_head/Dense_0"))

    def elbo_terms(self, x2d, eps, bank2d, data_idx, bank_idx, log_denom,
                   train=False):
        """eps is (B, 2*Z): [eps2 | eps1] packed by the caller."""
        torch = self.torch
        z = self.z_dim
        eps2, eps1 = eps[:, :z], eps[:, z:]
        q2_mean, q2_logvar = self.encode(x2d)
        z2 = q2_mean + torch.exp(0.5 * q2_logvar) * eps2
        q1_mean, q1_logvar = self._q_z1(x2d, z2)
        z1 = q1_mean + torch.exp(0.5 * q1_logvar) * eps1
        p1_mean, p1_logvar = self._p_z1(z2)
        extra_kl = (self._log_q(z1, q1_mean, q1_logvar)
                    - self._log_q(z1, p1_mean, p1_logvar))
        re = self._recon(x2d, z1, z2)
        log_q = self._log_q(z2, q2_mean, q2_logvar)
        log_p = self._log_p_exemplar(z2, bank2d, data_idx, bank_idx, log_denom,
                                     q_mean=q2_mean, train=train)
        return re, log_q - log_p + extra_kl

    def _recon(self, x2d, z1, z2):
        """Reconstruction term hook (overridden by the conv twin for the
        logistic-256 likelihood)."""
        return self._re_bernoulli(x2d, self.decode_probs(z1, z2))


class _ConvOpsMixin:
    """Shared torch re-expressions of the flax conv primitives (SAME
    padding, NHWC flatten order, the logistic-256 likelihood) used by the
    conv-family twins. Requires `self.h/self.w/self.c` (image dims),
    `self.torch`, and the flat param dict `self.p`."""

    def _to_nchw(self, x2d):
        return x2d.reshape(-1, self.h, self.w, self.c).permute(0, 3, 1, 2)

    def _nchw_flat(self, x):
        """NCHW -> flax's NHWC flatten order."""
        return x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)

    def _conv_raw(self, x, w, b, stride):
        F = self.torch.nn.functional
        k = w.shape[0]                        # flax layout (kh, kw, in, out)

        def pads(n):
            total = max((-(-n // stride) - 1) * stride + k - n, 0)
            return total // 2, total - total // 2
        ph, pw = pads(x.shape[2]), pads(x.shape[3])
        x = F.pad(x, (pw[0], pw[1], ph[0], ph[1]))
        return F.conv2d(x, w.permute(3, 2, 0, 1), b, stride=stride)

    def _conv(self, x, name, stride):
        return self._conv_raw(x, self.p[f"{name}/kernel"],
                              self.p[f"{name}/bias"], stride)

    def _log_logistic_256(self, x, mean, logvar):
        torch = self.torch
        bin_size = 1.0 / 256.0
        scale = torch.exp(logvar)
        xs = (torch.floor(x / bin_size) * bin_size - mean) / scale
        cdf_plus = torch.sigmoid(xs + bin_size / scale)
        cdf_minus = torch.sigmoid(xs)
        return torch.log(cdf_plus - cdf_minus + 1e-7).sum(-1)

    def _likelihood_heads(self, h):
        """1x1/stride-1 conv likelihood heads with the shared clamps
        (models/base.py::likelihood_params): sigmoid mean; for continuous
        inputs the mean is clipped to [1/512, 1-1/512] and the log-var
        head is hardtanh'd to [-4.5, 0]. -> (mean2d, logvar2d_or_None)."""
        torch = self.torch
        mean = torch.sigmoid(self._conv(h, "p_x_mean_head", 1))
        if self.input_type == "binary":
            return self._nchw_flat(mean), None
        mean = torch.clamp(mean, 1.0 / 512.0, 1.0 - 1.0 / 512.0)
        logvar = torch.clamp(self._conv(h, "p_x_logvar_head", 1), -4.5, 0.0)
        return self._nchw_flat(mean), self._nchw_flat(logvar)

    def _recon(self, x2d, z1, z2):
        mean, logvar = self.decode_out(x2d, z1, z2)
        if self.input_type == "binary":
            return self._re_bernoulli(x2d, mean)
        return self._log_logistic_256(x2d, mean, logvar)


class TorchTwinConvHVAE(_ConvOpsMixin, TorchTwinHVAE):
    """Trainable torch twin of the 2-level ConvHVAE (models/conv_hvae.py).

    Pins the conv conventions the flagship parity configs (3: ConvHVAE
    Fashion; 4: ConvHVAE CelebA) ride on and that no MLP twin touches:

    * flax ``nn.Conv`` SAME padding — asymmetric (low = total//2) when the
      total pad is odd (e.g. k=3 s=2 on even sizes), re-derived here from
      XLA's SAME definition ``total = max((ceil(n/s)-1)*s + k - n, 0)``;
    * flax ``nn.ConvTranspose`` SAME semantics — fractionally-strided
      CORRELATION (no kernel flip, ``transpose_kernel=False``): dilate the
      input by the stride, pad per lax's transpose-SAME rule
      ``pad_len = k + s - 2; pad_a = k-1 if s > k-1 else ceil(pad_len/2)``,
      then a stride-1 conv — output is exactly ``in * s``;
    * NHWC flatten order between the conv stacks and the dense heads;
    * the gated-conv channel split (value = first half of 2F channels);
    * the logistic-256 conv head for gray/continuous inputs: mean
      sigmoid-clipped to [1/512, 1-1/512], log-var hardtanh [-4.5, 0],
      discretized-logistic CDF difference over 1/256 bins (+1e-7).

    Nothing is copied — the reference mount is empty; this re-expresses the
    behavioral contract (SURVEY.md §0.2) independently in torch.

    The conv stack layout comes from the SAME spec strings that drive the
    JAX model (config.py::parse_conv_spec), so twin and model always agree
    on depth/kernels/strides.
    """

    def __init__(self, flax_params, lr=5e-4, *, input_size=(1, 28, 28),
                 input_type="binary", enc_spec=None, dec_spec=None,
                 proj_channels=64, **kw):
        from exemplar_vae_tpu.config import Config, parse_conv_spec
        d = Config()
        self.c, self.h, self.w = input_size
        self.input_type = input_type
        self.enc = parse_conv_spec(enc_spec or d.conv_enc_spec)
        self.dec = parse_conv_spec(dec_spec or d.conv_dec_spec)
        self.proj_channels = proj_channels
        self.down = 1
        for _, _, _, s in self.enc:
            self.down *= s
        super().__init__(flax_params, lr=lr, **kw)

    # ---------------- conv primitives (flax semantics, torch autograd) ----
    def _conv_t_raw(self, x, w, b, stride):
        F = self.torch.nn.functional
        k = w.shape[0]                        # (kh, kw, in, out)
        if stride > 1:                        # fractional stride: dilate input
            n, c, hh, ww = x.shape
            z = x.new_zeros(n, c, (hh - 1) * stride + 1, (ww - 1) * stride + 1)
            z[:, :, ::stride, ::stride] = x
            x = z
        pad_len = k + stride - 2              # lax transpose-SAME rule
        pad_a = k - 1 if stride > k - 1 else -(-pad_len // 2)
        pad_b = pad_len - pad_a
        x = F.pad(x, (pad_a, pad_b, pad_a, pad_b))
        return F.conv2d(x, w.permute(3, 2, 0, 1), b, stride=1)

    def _gated_w(self, name):
        """Concatenate the separate value/gate tensors (the reference's
        AdamNormGrad granularity) into the single fused conv the JAX layer
        runs — bit-identical compute, two-tensor parameters."""
        torch = self.torch
        w = torch.cat([self.p[f"{name}/h_kernel"],
                       self.p[f"{name}/g_kernel"]], dim=3)
        b = torch.cat([self.p[f"{name}/h_bias"], self.p[f"{name}/g_bias"]])
        return w, b

    def _gated_conv(self, x, name, stride):
        w, b = self._gated_w(name)
        hg = self._conv_raw(x, w, b, stride)
        h, g = hg.chunk(2, dim=1)
        return h * self.torch.sigmoid(g)

    def _gated_conv_t(self, x, name, stride):
        w, b = self._gated_w(name)
        hg = self._conv_t_raw(x, w, b, stride)
        h, g = hg.chunk(2, dim=1)
        return h * self.torch.sigmoid(g)

    def _conv_stack(self, x2d, prefix):
        x = self._to_nchw(x2d)
        for i, (kind, _, _, s) in enumerate(self.enc):
            x = self._gated_conv(x, f"{prefix}_{i}", s)
        return self._nchw_flat(x)

    # ---------------- inference net ---------------------------------------
    def encode(self, x2d):
        h = self._conv_stack(x2d, "q_z2_conv")
        mean = self._dense(h, "q_z2_mean_head")
        logvar = self.torch.clamp(self._dense(h, "q_z2_logvar_head/Dense_0"),
                                  -6.0, 2.0)
        return mean, logvar

    def _q_z1(self, x2d, z2):
        hx = self._conv_stack(x2d, "q_z1_conv")
        hz = self._gated(z2, "q_z1_z2")
        h = self._gated(self.torch.cat([hx, hz], -1), "q_z1_joint")
        mean = self._dense(h, "q_z1_mean_head")
        logvar = self.torch.clamp(self._dense(h, "q_z1_logvar_head/Dense_0"),
                                  -6.0, 2.0)
        return mean, logvar

    # ---------------- generative net --------------------------------------
    def decode_out(self, x2d, z1, z2):
        """-> (x_mean, x_logvar_or_None), flattened in NHWC order.
        `x2d` is unused (non-autoregressive decoder) — the signature is the
        `_ConvOpsMixin._recon` contract shared with the PixelCNN twin."""
        torch = self.torch
        h1 = self._gated(z1, "p_x_z1")
        h2 = self._gated(z2, "p_x_z2")
        h = self._dense(torch.cat([h1, h2], -1), "p_x_project")
        dh, dw = self.h // self.down, self.w // self.down
        h = h.reshape(-1, dh, dw, self.proj_channels).permute(0, 3, 1, 2)
        for i, (kind, _, _, s) in enumerate(self.dec):
            if kind == "t":
                h = self._gated_conv_t(h, f"p_x_deconv_{i}", s)
            else:
                h = self._gated_conv(h, f"p_x_deconv_{i}", s)
        return self._likelihood_heads(h)


class TorchTwinPixelHVAE(_ConvOpsMixin, TorchTwinHVAE):
    """Trainable torch twin of the PixelHVAE (models/pixel_hvae.py): the
    HVAE's MLP inference net + p(z1|z2) (TwoLevelMLPCore — shared param
    names, inherited from TorchTwinHVAE) with the autoregressive masked-conv
    decoder. Pins the masked-conv conventions no other twin touches:

    * the PixelCNN mask layout (layers.py::MaskedConv2d): spatial-only
      masking — center row blocked from the center column (+1 for type
      'B'), all rows below blocked; type 'A' (5x5 input layer) excludes
      the center pixel, type 'B' (3x3 stack) includes it;
    * the latent conditioning: dense ctx_proj(z1||z2) -> (H, W, F) context
      map ADDED to the input-layer output and to every stack layer output;
    * relu placement (between layers and before the heads, NOT on the
      input-layer's pixel input);
    * teacher forcing: training/eval run ONE parallel masked pass — the
      mask alone enforces causality;
    * the shared likelihood-head clamps via 1x1 convs (mixin).

    Nothing is copied — the reference mount is empty; this re-expresses the
    behavioral contract (SURVEY.md §0.2, models/pixel_hvae.py docstring)
    independently in torch."""

    def __init__(self, flax_params, lr=5e-4, *, input_size=(1, 28, 28),
                 input_type="binary", pixelcnn_features=64,
                 pixelcnn_layers=4, **kw):
        self.c, self.h, self.w = input_size
        self.input_type = input_type
        self.pf = pixelcnn_features
        self.n_pix_layers = pixelcnn_layers
        super().__init__(flax_params, lr=lr, **kw)

    def _masked_conv(self, x, name, mask_type):
        """Stride-1 SAME conv with the PixelCNN causal mask applied to the
        flax-layout kernel (layers.py::MaskedConv2d mask construction)."""
        torch = self.torch
        w = self.p[f"{name}/kernel"]          # (kh, kw, in, out)
        kh, kw = w.shape[0], w.shape[1]
        mask = torch.ones(kh, kw, 1, 1)
        ch, cw = kh // 2, kw // 2
        mask[ch, cw + (1 if mask_type == "B" else 0):] = 0.0
        mask[ch + 1:] = 0.0
        return self._conv_raw(x, w * mask, self.p[f"{name}/bias"], 1)

    def decode_out(self, x2d, z1, z2):
        """Teacher-forced autoregressive likelihood params (one parallel
        masked pass over the true pixels), flattened in NHWC order."""
        torch = self.torch
        ctx = self._dense(torch.cat([z1, z2], -1), "ctx_proj")
        ctx = ctx.reshape(-1, self.h, self.w, self.pf).permute(0, 3, 1, 2)
        h = self._masked_conv(self._to_nchw(x2d), "pix_in", "A") + ctx
        for i in range(self.n_pix_layers):
            h = self._masked_conv(torch.relu(h), f"pix_layers_{i}", "B") + ctx
        return self._likelihood_heads(torch.relu(h))
