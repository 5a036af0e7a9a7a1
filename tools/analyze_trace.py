"""Summarize a jax.profiler trace: where does device time actually go?

Usage:
    # 1. capture: run any config with --profile_epoch 2; the trace lands in
    #    <exp_dir>/profile/plugins/profile/<ts>/*.trace.json.gz
    # 2. summarize:
    /opt/venv/bin/python tools/analyze_trace.py <profile_dir_or_exp_dir>

Groups TPU-track slice durations by op category (fusion, convolution, dot,
copy, all-reduce, ...) and by the op's originating named scope, printing the
top entries — the decision input for kernel work (DESIGN.md §8).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(root):
    pats = [os.path.join(root, "**", "*.trace.json.gz"),
            os.path.join(root, "*.trace.json.gz")]
    hits = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return max(hits, key=os.path.getsize)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    path = find_trace(root)
    print(f"trace: {path}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # identify TPU/device process ids (track names contain 'TPU' or 'XLA Op')
    dev_pids = set()
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            names[e.get("pid")] = nm
            if re.search(r"TPU|/device:|Device", nm, re.I):
                dev_pids.add(e.get("pid"))
    if not dev_pids:  # fall back: every pid with X (complete) events
        dev_pids = {e.get("pid") for e in events if e.get("ph") == "X"}

    by_cat = collections.Counter()
    by_name = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        if name.startswith(("$", "process_")):
            continue
        total += dur
        # category = leading op kind of the (possibly fused) op name
        cat = re.split(r"[.\d]", name, 1)[0]
        by_cat[cat] += dur
        by_name[name] += dur

    print(f"device tracks: {sorted(names.get(p, p) for p in dev_pids)}")
    print(f"total device-slice time: {total/1e3:.2f} ms\n")
    print("== by op category ==")
    for cat, dur in by_cat.most_common(15):
        print(f"{dur/1e3:10.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {cat}")
    print("\n== top individual ops ==")
    for name, dur in by_name.most_common(25):
        print(f"{dur/1e3:10.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name[:100]}")


if __name__ == "__main__":
    main()
