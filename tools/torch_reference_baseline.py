"""From-scratch PyTorch re-expression of the reference's training step,
used ONLY to anchor bench.py's ``vs_baseline`` ratio.

The reference repo mount is empty (SURVEY.md header) and the reference never
published throughput numbers (BASELINE.md), so the 10x target is anchored by
re-expressing its per-step computation faithfully in torch (CPU build — the
only torch in this image) from the behavioral contract in SURVEY.md §0.1:
GatedDense(300)x2 encoder/decoder, z=40, full exact exemplar prior
(re-encode all N exemplars per step, pairwise log-normal + LOO + LSE),
AdamNormGrad. No code is copied from anywhere; this is a clean-room
re-expression of the documented objective.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import math
import time


def measure_torch_baseline(n_exemplars=50_000, batch=100, hidden=300, zdim=40,
                           d_in=784, steps=2, warmup=1, seed=0):
    """Returns images/sec of the reference-equivalent training step."""
    import torch

    torch.manual_seed(seed)

    class GatedDense(torch.nn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.h = torch.nn.Linear(i, o)
            self.g = torch.nn.Linear(i, o)

        def forward(self, x):
            return self.h(x) * torch.sigmoid(self.g(x))

    class VAE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.q = torch.nn.Sequential(GatedDense(d_in, hidden),
                                         GatedDense(hidden, hidden))
            self.q_mean = torch.nn.Linear(hidden, zdim)
            self.q_logvar = torch.nn.Linear(hidden, zdim)
            self.p = torch.nn.Sequential(GatedDense(zdim, hidden),
                                         GatedDense(hidden, hidden))
            self.p_mean = torch.nn.Linear(hidden, d_in)
            self.prior_log_var = torch.nn.Parameter(torch.zeros(()))

        def encode(self, x):
            h = self.q(x)
            return self.q_mean(h), torch.clamp(self.q_logvar(h), -6, 2)

    model = VAE()
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)
    data = torch.rand(n_exemplars, d_in)
    idx_all = torch.arange(n_exemplars)

    def step(i):
        x_idx = torch.randint(0, n_exemplars, (batch,))
        x = torch.bernoulli(data[x_idx])
        bank = torch.bernoulli(data)
        mu, lv = model.encode(x)
        z = mu + torch.exp(0.5 * lv) * torch.randn_like(mu)
        h = model.p(z)
        probs = torch.sigmoid(model.p_mean(h)).clamp(1e-5, 1 - 1e-5)
        re = (x * probs.log() + (1 - x) * (1 - probs).log()).sum(-1)
        log_q = (-0.5 * (lv + (z - mu) ** 2 / lv.exp())).sum(-1)
        # exact exemplar prior: re-encode ALL N exemplars, pairwise + LSE
        bank_mu, _ = model.encode(bank)
        sq = (torch.cdist(z, bank_mu) ** 2)
        logits = -0.5 * (zdim * model.prior_log_var
                         + sq * torch.exp(-model.prior_log_var))
        mask = x_idx[:, None] == idx_all[None, :]
        logits = logits.masked_fill(mask, -1e30)
        log_p = torch.logsumexp(logits, dim=-1) - math.log(n_exemplars - 1)
        loss = (-re + (log_q - log_p)).mean()
        opt.zero_grad()
        loss.backward()
        # AdamNormGrad: per-tensor grad L2 normalization before Adam
        for p in model.parameters():
            if p.grad is not None:
                p.grad.div_(p.grad.norm() + 1e-7)
        opt.step()
        return float(loss)

    for i in range(warmup):
        step(i)
    t0 = time.perf_counter()
    for i in range(steps):
        step(i)
    dt = time.perf_counter() - t0
    return batch * steps / dt


if __name__ == "__main__":
    ips = measure_torch_baseline(steps=2)
    print(f"torch-cpu reference baseline: {ips:.2f} images/sec")
