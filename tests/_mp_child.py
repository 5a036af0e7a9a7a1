"""Child process for the 2-process jax.distributed smoke test
(tests/test_multiprocess.py; round-2 VERDICT next-round item 6).

Forms a real multi-process JAX cluster on localhost (CPU backend, gloo
collectives, 1 device per process) through the SAME entry point a pod
would use — parallel/mesh.maybe_init_distributed reading
JAX_COORDINATOR_ADDRESS — then runs one tiny data-parallel train step over
the global 2-device mesh with the batch constructed via
make_array_from_process_local_data, and prints the (globally-reduced)
loss + updated-param checksum for the parent to compare across ranks and
against a single-process oracle.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
try:  # cross-process CPU collectives need the gloo backend
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# share the suite's persistent compilation cache (exemplar_vae_tpu/
# compile_cache.py): the children's Experiment compiles dominate the
# multiprocess tests' wall time and are identical across runs
from exemplar_vae_tpu.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from exemplar_vae_tpu.parallel.mesh import maybe_init_distributed  # noqa: E402


def run_experiment(snapshot_dir):
    """Full tiny Experiment across the 2-process mesh: one train epoch +
    validation; prints replicated metrics for cross-rank comparison and
    against the parent's single-process oracle."""
    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    cfg = Config(dataset_name="synthetic_gray", model_name="vae",
                 prior="exemplar_prior", training_set_size=64,
                 val_set_size=16, test_set_size=16, number_components=64,
                 batch_size=16, test_batch_size=16, hidden_size=16,
                 z1_size=8, z2_size=8, warmup=2, epochs=1, S=2, MB=2,
                 use_pallas_prior=False, prior_block_n=32,
                 exact_reencode_chunk=32, mesh_shape=(2,),
                 snapshot_dir=snapshot_dir)
    exp = Experiment(cfg, verbose=False)
    assert exp.multi and exp.sharded_exact_fn is not None
    m = exp.train_epoch()
    val = exp.validate()
    print(f"EXPRESULT loss={m['loss']:.8f} val={float(val[0]):.8f}",
          flush=True)


def run_ckpt_cycle(snapshot_dir):
    """Multi-host checkpoint round-trip (both backends) in approximate-
    prior mode, where the kNN cache is SHARDED across the two processes —
    the one state leaf that cannot be device_get and must be gathered
    collectively (checkpoints._to_host). Asserts inside the child: restore
    succeeds, the restored validate is bitwise the pre-save validate, and
    the sharded cache round-trips exactly; prints the value for cross-rank
    + single-process-oracle comparison by the parent."""
    from jax.experimental import multihost_utils

    from exemplar_vae_tpu.config import Config
    from exemplar_vae_tpu.train.trainer import Experiment

    cfg = Config(dataset_name="synthetic_gray", model_name="vae",
                 prior="exemplar_prior", approximate_prior=True,
                 approximate_k=4, training_set_size=64, val_set_size=16,
                 test_set_size=16, number_components=64, batch_size=16,
                 test_batch_size=16, hidden_size=16, z1_size=8, z2_size=8,
                 warmup=2, epochs=1, S=2, MB=2, use_pallas_prior=False,
                 prior_block_n=32, exact_reencode_chunk=32,
                 mesh_shape=(jax.device_count(),), snapshot_dir=snapshot_dir)
    exp = Experiment(cfg, verbose=False)
    exp.train_epoch()  # refreshes the sharded kNN cache, sets epoch=1
    val0 = float(exp.validate()[0])
    cache0 = np.asarray(multihost_utils.process_allgather(
        exp.bank.cache_means, tiled=True)) if jax.process_count() > 1 \
        else np.asarray(exp.bank.cache_means)
    for backend, tag in (("npz", "cknpz"), ("orbax", "ckorbax")):
        exp.cfg = exp.cfg.replace(checkpoint_backend=backend)
        exp.save_checkpoint(tag)
        exp2 = Experiment(cfg.replace(checkpoint_backend=backend),
                          verbose=False)
        assert exp2.restore_checkpoint(tag), f"restore failed: {backend}"
        assert exp2.epoch == 1, exp2.epoch
        cache1 = np.asarray(multihost_utils.process_allgather(
            exp2.bank.cache_means, tiled=True)) if jax.process_count() > 1 \
            else np.asarray(exp2.bank.cache_means)
        np.testing.assert_array_equal(cache0, cache1)
        val1 = float(exp2.validate()[0])
        assert val1 == val0, (backend, val0, val1)
    print(f"CKPTRESULT val={val0:.8f}", flush=True)


def main():
    assert maybe_init_distributed(), "coordinator env vars not picked up"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 1
    assert len(jax.devices()) == 2, "global mesh must span both processes"

    mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    # global batch 8x4: each process holds its own 4-row local shard
    rank = jax.process_index()
    full = np.arange(32, dtype=np.float32).reshape(8, 4) / 32.0
    local = full[rank * 4:(rank + 1) * 4]
    x = jax.make_array_from_process_local_data(batch_sh, local, full.shape)
    w = jax.device_put(jnp.full((4,), 0.5, jnp.float32), repl)

    @jax.jit
    def step(w, x):
        def loss_fn(w):
            pred = x @ w                       # (8,) global
            return jnp.mean(jnp.square(pred - 1.0))
        loss, g = jax.value_and_grad(loss_fn)(w)
        return loss, w - 0.1 * g

    loss, w2 = step(w, x)
    # fetching replicated outputs is process-local; all ranks must agree
    print(f"RESULT loss={float(loss):.8f} "
          f"wsum={float(jnp.sum(w2)):.8f}", flush=True)

    if os.environ.get("MP_CHILD_EXPERIMENT_DIR"):
        run_experiment(os.environ["MP_CHILD_EXPERIMENT_DIR"])
    if os.environ.get("MP_CHILD_CKPT_DIR"):
        run_ckpt_cycle(os.environ["MP_CHILD_CKPT_DIR"])


if __name__ == "__main__":
    main()
