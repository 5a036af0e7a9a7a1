"""Device mesh + sharding layout.

The reference is single-device (SURVEY.md §0.5 — no torch.distributed, no
NCCL); all parallelism here is new, TPU-native design (SURVEY.md §2.3):

* mesh axis ``data``: batch rows AND the exemplar bank are sharded on it;
* params are replicated (models are a few M params — no TP needed);
* the exemplar-prior logsumexp reduces per-shard partials over ICI with
  psum/pmax in log space (parallel/sharded_prior.py) — this project's
  analogue of ring attention, the "sequence axis" being the exemplar count.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exemplar_vae_tpu.config import Config


_DISTRIBUTED_INITIALIZED = False


def maybe_init_distributed() -> bool:
    """Join the jax.distributed cluster when the standard coordinator env
    vars are set (single-controller JAX stays the default — SURVEY.md §2.3
    'launcher/elastic' row).

    Set JAX_COORDINATOR_ADDRESS (+ optional JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or rely on the TPU metadata autodetection) on every
    host of a multi-host pod before launching; each process then sees its
    local chips and `jax.devices()` spans the pod. The mesh/sharding layer
    (this module, sharded_prior, sharded_knn) is process-count-agnostic,
    and `Experiment` runs multi-process too: host data goes onto the
    global mesh via global_put, every process executes the same SPMD
    program in lockstep, and process 0 owns the filesystem.
    tests/test_multiprocess.py exercises a real 2-process cluster — a raw
    cross-process sharded train step, a full tiny Experiment epoch, AND a
    checkpoint save/restore cycle (both backends; the cross-process-sharded
    kNN cache is gathered collectively, rank 0 writes, all ranks barrier —
    train/checkpoints.py::save_checkpoint), each asserted equal to the
    single-process run. Known limit (documented, not silent): checkpoints
    assume a shared filesystem and gather-to-host writes — right for this
    framework's ≤tens-of-MB state; per-host sharded orbax writes are
    deliberately not used. Returns True iff initialize() was called.
    Idempotent.
    """
    global _DISTRIBUTED_INITIALIZED
    import os
    if _DISTRIBUTED_INITIALIZED:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    kw = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kw)
    _DISTRIBUTED_INITIALIZED = True
    return True


def global_put(arr, sharding: NamedSharding):
    """Place host data onto a (possibly multi-process) sharding.

    Single-controller jax.device_put breaks across processes (it requires
    the target devices to be addressable). make_array_from_callback is the
    process-agnostic primitive: every process supplies the data for ITS
    addressable shards from the full host array, and the result is one
    global jax.Array. Requires every process to hold identical host data
    (true here: synthetic data is deterministic, real loaders read the same
    files, and state init derives from cfg.seed). Single-process it is
    equivalent to device_put.
    """
    if jax.process_count() == 1:
        # plain device_put: equivalent, and avoids the per-shard callback
        # fetch path (observed to stall on this image's tunneled TPU)
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def create_mesh(cfg: Config) -> Mesh:
    """Build the ('data',) mesh from cfg.mesh_shape over available devices."""
    maybe_init_distributed()
    n = int(np.prod(cfg.mesh_shape))
    devices = jax.devices()[:n]
    if len(devices) < n:
        raise ValueError(f"mesh needs {n} devices, have {len(jax.devices())}")
    return Mesh(np.asarray(devices).reshape(cfg.mesh_shape), cfg.mesh_axes)


def bank_sharding(mesh: Mesh) -> NamedSharding:
    """Exemplar bank rows sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Per-step batch rows sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_shards(arr, mesh: Mesh, pad_value=0):
    """Pad axis 0 to a multiple of the mesh size (returns array, true_n)."""
    n_dev = mesh.devices.size
    n = arr.shape[0]
    pad = (-n) % n_dev
    if pad:
        widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        arr = np.pad(np.asarray(arr), widths, constant_values=pad_value)
    return arr, n
