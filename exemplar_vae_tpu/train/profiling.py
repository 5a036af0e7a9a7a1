"""Tracing / profiling / numerics-debug harness.

The reference has no profiling or sanitizer stack (SURVEY.md §5: users
eyeball per-epoch wall times). TPU-native replacements:

* ``trace(dir)`` — capture a jax.profiler trace (XLA op-level timeline,
  viewable in TensorBoard/Perfetto) around any block, e.g. one epoch;
* ``StepTimer`` — block_until_ready-accurate throughput meter that reports
  the BASELINE.json KPIs (images/sec, exemplar-distances/sec);
* ``nan_debug()`` — enables jax_debug_nans: any NaN produced inside jit
  raises at the producing op (the rebuild's "sanitizer mode", SURVEY.md §5
  race-detection row).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_debug(enable: bool = True):
    """NaN sanitizer: raise at the op that produced a NaN inside jit."""
    jax.config.update("jax_debug_nans", enable)


def fetch_sync(out) -> float:
    """Synchronize by FETCHING one scalar of ``out`` to the host.

    On the tunneled axon TPU platform ``block_until_ready`` was observed to
    return before execution finished for some computations (large-output
    matmuls timed at a physically impossible 45 PFLOP/s), while a
    device->host element fetch always waits for the real result. Every
    timing harness in this repo ends its timed region with this instead of
    (or in addition to) block_until_ready.
    """
    import jax.numpy as jnp
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


class StepTimer:
    """Throughput meter around compiled steps.

    Usage:
        t = StepTimer(images_per_step=batch, distances_per_step=batch * n)
        with t:  # per measured region
            out = step(...)
            jax.block_until_ready(out)
        t.images_per_sec, t.distances_per_sec
    """

    def __init__(self, images_per_step: int = 0, distances_per_step: int = 0):
        self.images_per_step = images_per_step
        self.distances_per_step = distances_per_step
        self.total_seconds = 0.0
        self.steps = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total_seconds += time.perf_counter() - self._t0
        self.steps += 1
        return False

    @property
    def seconds_per_step(self) -> float:
        return self.total_seconds / max(self.steps, 1)

    @property
    def images_per_sec(self) -> float:
        return self.images_per_step * self.steps / max(self.total_seconds, 1e-12)

    @property
    def distances_per_sec(self) -> float:
        return (self.distances_per_step * self.steps
                / max(self.total_seconds, 1e-12))

    def report(self) -> dict:
        return {
            "steps": self.steps,
            "seconds_per_step": self.seconds_per_step,
            "images_per_sec": self.images_per_sec,
            "distances_per_sec": self.distances_per_sec,
        }
