"""From-scratch PyTorch re-expression of the reference's training step,
used ONLY to anchor ``vs_baseline`` ratios in bench.py / bench_all.py.

The reference repo mount is empty (SURVEY.md header) and the reference never
published throughput numbers (BASELINE.md), so the 10x target is anchored by
re-expressing its per-step computation faithfully in torch (CPU build — the
only torch in this image) from the behavioral contract in SURVEY.md §0.1-0.2.
No code is copied from anywhere; this is a clean-room re-expression of the
documented objective.

Measurement protocol (VERDICT r1 weak-2 fixes):
* >= ``min_steps`` timed steps (default 20), or as many as fit a wall-clock
  budget for the very slow conv configs (never fewer than 2), after warmup;
* the exemplar BANK is encoded from the held dataset tensors
  deterministically — only the training batch gets the fresh per-step
  Bernoulli/dequantization draw, matching the rebuild's (and the
  reference's [U]) convention; the round-1 version re-binarized the whole
  50k bank every step, inflating the baseline's cost;
* approximate mode uses a stale cache computed OUTSIDE the timed loop
  (refreshed per epoch in the reference, i.e. amortized over ~500 steps);
* supports the same model families as bench_all's configs: MLP VAE,
  MLP HVAE_2level, ConvHVAE_2level (exact + approximate-kNN), vampprior.

Caveat (BASELINE.md): the honest anchor — the GPU-era torch reference — is
unmeasurable in this image (torch is CPU-only, no CUDA); these numbers anchor
"single-chip TPU rebuild vs the same objective on this host's CPU".
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import math
import time


BASELINE_CACHE = "bench_baseline_cache.json"


def baseline_cache_get(key, path=BASELINE_CACHE):
    """Shared torch-CPU baseline cache (bench.py + bench_all.py write the
    SAME file — one read/write implementation so the format can't fork)."""
    import json
    import os
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh).get(key)
    return None


def baseline_cache_put(key, val, path=BASELINE_CACHE):
    import json
    import os
    cache = {}
    if os.path.exists(path):
        with open(path) as fh:
            cache = json.load(fh)
    cache[key] = val
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(cache, fh, indent=1)
    os.replace(tmp, path)


def _build_torch_models(model_name, d_shape, hidden, z1, z2, input_type):
    import torch

    c, ih, iw = d_shape
    d_in = c * ih * iw

    class GatedDense(torch.nn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.h = torch.nn.Linear(i, o)
            self.g = torch.nn.Linear(i, o)

        def forward(self, x):
            return self.h(x) * torch.sigmoid(self.g(x))

    class GatedConv(torch.nn.Module):
        def __init__(self, ci, co, k, s):
            super().__init__()
            pad = k // 2
            self.h = torch.nn.Conv2d(ci, co, k, s, pad)
            self.g = torch.nn.Conv2d(ci, co, k, s, pad)

        def forward(self, x):
            return self.h(x) * torch.sigmoid(self.g(x))

    class GatedConvT(torch.nn.Module):
        def __init__(self, ci, co, k, s):
            super().__init__()
            self.h = torch.nn.ConvTranspose2d(ci, co, k, s, 1, output_padding=1)
            self.g = torch.nn.ConvTranspose2d(ci, co, k, s, 1, output_padding=1)

        def forward(self, x):
            return self.h(x) * torch.sigmoid(self.g(x))

    if model_name == "vae":
        class Net(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.q = torch.nn.Sequential(GatedDense(d_in, hidden),
                                             GatedDense(hidden, hidden))
                self.q_mean = torch.nn.Linear(hidden, z1)
                self.q_logvar = torch.nn.Linear(hidden, z1)
                self.p = torch.nn.Sequential(GatedDense(z1, hidden),
                                             GatedDense(hidden, hidden))
                self.p_mean = torch.nn.Linear(hidden, d_in)
                if input_type != "binary":
                    self.p_logvar = torch.nn.Linear(hidden, d_in)
                self.prior_log_var = torch.nn.Parameter(torch.zeros(()))

            def encode_top(self, x):
                h = self.q(x.reshape(x.shape[0], -1))
                return self.q_mean(h), torch.clamp(self.q_logvar(h), -6, 2)

            def decode_heads(self, ztop, z_low=None):
                h = self.p(ztop)
                lv = (self.p_logvar(h) if input_type != "binary"
                      else torch.zeros(()))
                return self.p_mean(h), lv

            extra_levels = False

        return Net()

    if model_name == "hvae_2level":
        class Net(torch.nn.Module):
            extra_levels = True

            def __init__(self):
                super().__init__()
                self.q2 = torch.nn.Sequential(GatedDense(d_in, hidden),
                                              GatedDense(hidden, hidden))
                self.q2_mean = torch.nn.Linear(hidden, z2)
                self.q2_logvar = torch.nn.Linear(hidden, z2)
                self.q1x = GatedDense(d_in, hidden)
                self.q1z = GatedDense(z2, hidden)
                self.q1j = GatedDense(2 * hidden, hidden)
                self.q1_mean = torch.nn.Linear(hidden, z1)
                self.q1_logvar = torch.nn.Linear(hidden, z1)
                self.pz1 = torch.nn.Sequential(GatedDense(z2, hidden),
                                               GatedDense(hidden, hidden))
                self.pz1_mean = torch.nn.Linear(hidden, z1)
                self.pz1_logvar = torch.nn.Linear(hidden, z1)
                self.px1 = GatedDense(z1, hidden)
                self.px2 = GatedDense(z2, hidden)
                self.px = GatedDense(2 * hidden, hidden)
                self.p_mean = torch.nn.Linear(hidden, d_in)
                if input_type != "binary":
                    self.p_logvar = torch.nn.Linear(hidden, d_in)
                self.prior_log_var = torch.nn.Parameter(torch.zeros(()))

            def encode_top(self, x):
                h = self.q2(x.reshape(x.shape[0], -1))
                return self.q2_mean(h), torch.clamp(self.q2_logvar(h), -6, 2)

            def level1(self, x, ztop):
                import torch as t
                hx = self.q1x(x.reshape(x.shape[0], -1))
                hz = self.q1z(ztop)
                h = self.q1j(t.cat([hx, hz], -1))
                q1m, q1lv = self.q1_mean(h), t.clamp(self.q1_logvar(h), -6, 2)
                z1s = q1m + t.exp(0.5 * q1lv) * t.randn_like(q1m)
                hp = self.pz1(ztop)
                p1m, p1lv = self.pz1_mean(hp), t.clamp(self.pz1_logvar(hp), -6, 2)
                lq = (-0.5 * (q1lv + (z1s - q1m) ** 2 / q1lv.exp())).sum(-1)
                lp = (-0.5 * (p1lv + (z1s - p1m) ** 2 / p1lv.exp())).sum(-1)
                return z1s, lq - lp

            def decode_heads(self, ztop, z_low):
                import torch as t
                h = self.px(t.cat([self.px1(z_low), self.px2(ztop)], -1))
                lv = (self.p_logvar(h) if input_type != "binary"
                      else torch.zeros(()))
                return self.p_mean(h), lv

        return Net()

    # convhvae_2level — mirrors exemplar_vae_tpu/models/conv_hvae.py shapes
    class Net(torch.nn.Module):
        extra_levels = True

        def __init__(self):
            super().__init__()
            def enc_stack():
                return torch.nn.Sequential(
                    GatedConv(c, 32, 7, 1), GatedConv(32, 32, 3, 2),
                    GatedConv(32, 64, 5, 1), GatedConv(64, 64, 3, 2))
            feat = 64 * (ih // 4) * (iw // 4)
            self.q2c = enc_stack()
            self.q2_mean = torch.nn.Linear(feat, z2)
            self.q2_logvar = torch.nn.Linear(feat, z2)
            self.q1c = enc_stack()
            self.q1z = GatedDense(z2, hidden)
            self.q1j = GatedDense(feat + hidden, hidden)
            self.q1_mean = torch.nn.Linear(hidden, z1)
            self.q1_logvar = torch.nn.Linear(hidden, z1)
            self.pz1 = torch.nn.Sequential(GatedDense(z2, hidden),
                                           GatedDense(hidden, hidden))
            self.pz1_mean = torch.nn.Linear(hidden, z1)
            self.pz1_logvar = torch.nn.Linear(hidden, z1)
            self.px1 = GatedDense(z1, hidden)
            self.px2 = GatedDense(z2, hidden)
            self.p_proj = torch.nn.Linear(2 * hidden, feat)
            self.p_deconv = torch.nn.Sequential(
                GatedConvT(64, 64, 3, 2), GatedConvT(64, 32, 3, 2),
                GatedConv(32, 32, 3, 1))
            self.p_mean = torch.nn.Conv2d(32, c, 1)
            if input_type != "binary":
                self.p_logvar = torch.nn.Conv2d(32, c, 1)
            self.prior_log_var = torch.nn.Parameter(torch.zeros(()))

        def encode_top(self, x):
            h = self.q2c(x).reshape(x.shape[0], -1)
            return self.q2_mean(h), torch.clamp(self.q2_logvar(h), -6, 2)

        def level1(self, x, ztop):
            import torch as t
            hx = self.q1c(x).reshape(x.shape[0], -1)
            h = self.q1j(t.cat([hx, self.q1z(ztop)], -1))
            q1m, q1lv = self.q1_mean(h), t.clamp(self.q1_logvar(h), -6, 2)
            z1s = q1m + t.exp(0.5 * q1lv) * t.randn_like(q1m)
            hp = self.pz1(ztop)
            p1m, p1lv = self.pz1_mean(hp), t.clamp(self.pz1_logvar(hp), -6, 2)
            lq = (-0.5 * (q1lv + (z1s - q1m) ** 2 / q1lv.exp())).sum(-1)
            lp = (-0.5 * (p1lv + (z1s - p1m) ** 2 / p1lv.exp())).sum(-1)
            return z1s, lq - lp

        def decode_heads(self, ztop, z_low):
            import torch as t
            h = self.p_proj(t.cat([self.px1(z_low), self.px2(ztop)], -1))
            h = h.reshape(h.shape[0], 64, ih // 4, iw // 4)
            h = self.p_deconv(h)
            lv = (self.p_logvar(h).reshape(h.shape[0], -1)
                  if input_type != "binary" else torch.zeros(()))
            return self.p_mean(h).reshape(h.shape[0], -1), lv

    return Net()


def measure_torch_config(model_name="vae", n_exemplars=50_000, batch=100,
                         hidden=300, z1=40, z2=40, d_shape=(1, 28, 28),
                         input_type="binary", prior="exemplar_prior",
                         approximate=False, k=10, n_pseudo=500,
                         min_steps=20, warmup=3, budget_s=120.0, seed=0):
    """images/sec of the reference-equivalent training step for one config."""
    import torch

    torch.manual_seed(seed)
    c, ih, iw = d_shape
    d_in = c * ih * iw
    model = _build_torch_models(model_name, d_shape, hidden, z1, z2, input_type)
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)
    data = torch.rand(n_exemplars, c, ih, iw)
    idx_all = torch.arange(n_exemplars)
    if prior == "vampprior":
        pseudo = torch.nn.Parameter(torch.rand(n_pseudo, c, ih, iw))
        opt.add_param_group({"params": [pseudo]})

    def log_lik(x, mean_raw, logvar):
        if input_type == "binary":
            probs = torch.sigmoid(mean_raw).clamp(1e-5, 1 - 1e-5)
            xf = x.reshape(x.shape[0], -1)
            return (xf * probs.log() + (1 - xf) * (1 - probs).log()).sum(-1)
        # logistic-256 CDF difference
        mean = torch.sigmoid(mean_raw).clamp(1 / 512, 1 - 1 / 512)
        xf = x.reshape(x.shape[0], -1)
        binsize = 1.0 / 256.0
        scale = torch.exp(logvar)
        xs = (torch.floor(xf / binsize) * binsize - mean) / scale
        cdf = torch.sigmoid(xs + binsize / scale) - torch.sigmoid(xs)
        return torch.log(cdf.clamp_min(1e-7)).sum(-1)

    def preprocess(x):
        if input_type == "binary":
            return torch.bernoulli(x)
        return (torch.floor(x * 255) + torch.rand_like(x)) / 256.0

    # approximate mode: stale cache computed OUTSIDE the timed loop (the
    # reference refreshes it once per epoch, ~N/batch steps). The cache's
    # CONTENT doesn't affect step timing (same top-k / gather / re-encode
    # cost for any values), so it's built by tiling a 4096-row encode —
    # encoding a 200k conv bank on this CPU would take ~25 min for a
    # number that is never read for its values.
    cache = None
    if approximate:
        with torch.no_grad():
            probe_n = min(n_exemplars, 4096)
            probe = model.encode_top(data[:probe_n])[0]
            reps = -(-n_exemplars // probe_n)
            cache = probe.repeat(reps, 1)[:n_exemplars].contiguous()
            cache += 0.01 * torch.randn_like(cache)  # break exact ties

    def prior_log_p(ztop, x_idx):
        if prior == "standard":
            return (-0.5 * ztop ** 2).sum(-1)
        if prior == "vampprior":
            mu, lv = model.encode_top(pseudo)
            sq = torch.cdist(ztop, mu) ** 2  # isotropic approx of diag for bench
            logits = -0.5 * (z2 * lv.mean() + sq * torch.exp(-lv.mean()))
            return torch.logsumexp(logits, -1) - math.log(n_pseudo)
        if approximate:
            with torch.no_grad():
                d2 = torch.cdist(ztop.detach(), cache)
                nn_idx = d2.topk(k, largest=False).indices        # (B, K)
            sel = data[nn_idx.reshape(-1)]                        # (B*K, ...)
            mu_sel, _ = model.encode_top(sel)
            mu_sel = mu_sel.reshape(ztop.shape[0], k, -1)
            sq = ((ztop[:, None, :] - mu_sel) ** 2).sum(-1)
            logits = -0.5 * (ztop.shape[-1] * model.prior_log_var
                             + sq * torch.exp(-model.prior_log_var))
            mask = x_idx[:, None] == nn_idx
            logits = logits.masked_fill(mask, -1e30)
            return torch.logsumexp(logits, -1) - math.log(n_exemplars - 1)
        # exact: re-encode ALL N exemplars (deterministic held tensors)
        bank_mu, _ = model.encode_top(data)
        sq = torch.cdist(ztop, bank_mu) ** 2
        logits = -0.5 * (ztop.shape[-1] * model.prior_log_var
                         + sq * torch.exp(-model.prior_log_var))
        mask = x_idx[:, None] == idx_all[None, :]
        logits = logits.masked_fill(mask, -1e30)
        return torch.logsumexp(logits, -1) - math.log(n_exemplars - 1)

    def step(i):
        x_idx = torch.randint(0, n_exemplars, (batch,))
        x = preprocess(data[x_idx])
        mu, lv = model.encode_top(x)
        ztop = mu + torch.exp(0.5 * lv) * torch.randn_like(mu)
        extra_kl = 0.0
        z_low = None
        if model.extra_levels:
            z_low, extra_kl = model.level1(x, ztop)
        mean_raw, out_lv = model.decode_heads(ztop, z_low)
        re = log_lik(x, mean_raw, out_lv)
        log_q = (-0.5 * (lv + (ztop - mu) ** 2 / lv.exp())).sum(-1)
        log_p = prior_log_p(ztop, x_idx)
        loss = (-re + (log_q - log_p + extra_kl)).mean()
        opt.zero_grad()
        loss.backward()
        # AdamNormGrad: per-tensor grad L2 normalization before Adam
        for p in model.parameters():
            if p.grad is not None:
                p.grad.div_(p.grad.norm() + 1e-7)
        opt.step()
        return float(loss.detach())

    for i in range(warmup):
        step(i)
    t0 = time.perf_counter()
    steps_done = 0
    while steps_done < min_steps:
        step(steps_done)
        steps_done += 1
        if time.perf_counter() - t0 > budget_s and steps_done >= 2:
            break
    dt = time.perf_counter() - t0
    return batch * steps_done / dt, steps_done


def extrapolated_exact_baseline(d_shape, input_type, n_target,
                                probe_ns=(1000, 2000), **kw):
    """Exact-prior conv configs at CelebA scale take minutes/step on this
    CPU — measure two smaller exemplar counts, fit seconds/step linear in N
    (the full-bank re-encode dominates and is exactly linear), extrapolate.
    Returns (images/sec at n_target, details dict). The extrapolation is
    recorded in the bench JSON rather than hidden."""
    batch = kw.get("batch", 100)
    pts = []
    for n in probe_ns:
        ips, steps = measure_torch_config(
            model_name="convhvae_2level", n_exemplars=n, d_shape=d_shape,
            input_type=input_type, approximate=False, min_steps=2, warmup=1,
            budget_s=180.0, **{k: v for k, v in kw.items() if k != "batch"})
        pts.append((n, batch / ips))  # (N, sec/step)
    (n1, t1), (n2, t2) = pts
    slope = (t2 - t1) / (n2 - n1)
    t_target = max(t1 + slope * (n_target - n1), 1e-6)
    return batch / t_target, {"probe_points_sec_per_step": pts,
                              "extrapolated_to_N": n_target}


def measure_torch_baseline(n_exemplars=50_000, batch=100, hidden=300, zdim=40,
                           d_in=784, steps=20, warmup=3, seed=0):
    """Back-compat wrapper for bench.py: MLP VAE, exact exemplar prior."""
    ips, _ = measure_torch_config(
        model_name="vae", n_exemplars=n_exemplars, batch=batch, hidden=hidden,
        z1=zdim, d_shape=(1, 28, 28), min_steps=steps, warmup=warmup,
        seed=seed)
    return ips


if __name__ == "__main__":
    ips = measure_torch_baseline()
    print(f"torch-cpu reference baseline: {ips:.2f} images/sec")
