"""Throughput scaling in the train batch size (exact exemplar prior).

The reference protocol trains at batch 100 (BASELINE.json), where the step
is dominated by the O(N) differentiable bank re-encode (DESIGN.md §8):
1.8 ms of a ~2.0 ms step is spent on work that is INDEPENDENT of the batch
size. Scaling the batch amortizes that fixed cost — this tool measures the
framework's throughput ceiling when the user is free to pick the batch
(larger-batch training changes the optimization trajectory, so these rows
are a capability measurement, NOT the parity protocol).

Run on the TPU when idle:

    /opt/venv/bin/python tools/bench_batch_scaling.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

from tools.ablate_step import time_variant

N = 50_000


def main():
    ex = dict(prior="exemplar_prior", number_components=N,
              training_set_size=N, use_pallas_prior=True)
    rows = []
    for b in (100, 250, 500, 1000, 2000, 5000):
        steps = min(200, N // b)
        # amortize per-epoch dispatch/sync comparably across rows: repeat
        # the timed epoch until >=200 total steps are timed (batch 5000 has
        # only 10 steps/epoch; one epoch would bias ms_per_step upward
        # exactly where the scaling claim matters)
        repeats = max(1, -(-200 // steps))
        ms = time_variant(f"exact N={N}, batch {b}", dict(batch_size=b, **ex),
                          steps=steps, repeats=repeats)
        rows.append({"batch": b, "steps_timed": steps * repeats,
                     "ms_per_step": round(ms, 3),
                     "images_per_sec": round(b / (ms / 1e3))})
    out = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "BATCH_SCALING.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows, indent=1))
    print(f"wrote {out}")
    return rows


if __name__ == "__main__":
    main()
