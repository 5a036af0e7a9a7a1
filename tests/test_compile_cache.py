"""The shared persistent-compile-cache helper (exemplar_vae_tpu/
compile_cache.py) backs three bootstrap paths — the test session, the
multiprocess children, and the driver dryrun — so its contract (default
dir at the repo root, env off-switch, never raising) gets its own pins.
"""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_default_dir_is_repo_jax_cache(monkeypatch):
    from exemplar_vae_tpu import compile_cache

    # the documented env knob must not leak into the default-dir assertion
    # (round-4 ADVICE: the suite failed whenever EXEMPLAR_JAX_CACHE was set
    # in the invoking environment)
    monkeypatch.delenv("EXEMPLAR_JAX_CACHE", raising=False)
    got = compile_cache.enable()
    assert got == os.path.join(REPO_ROOT, ".jax_cache")
    import jax

    assert jax.config.jax_compilation_cache_dir == got


def test_env_off_switch_disables(monkeypatch):
    from exemplar_vae_tpu import compile_cache

    monkeypatch.setenv("EXEMPLAR_JAX_CACHE", "off")
    assert compile_cache.enable() is None


def test_env_override_dir(tmp_path, monkeypatch):
    # fresh interpreter: this session's jax already has the repo cache dir
    # set, and the assert must see the override taking effect from scratch
    env = dict(os.environ, EXEMPLAR_JAX_CACHE=str(tmp_path))
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu')\n"
         "from exemplar_vae_tpu.compile_cache import enable\n"
         "print(enable())"],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-1000:]
    assert out.stdout.strip().endswith(str(tmp_path))
