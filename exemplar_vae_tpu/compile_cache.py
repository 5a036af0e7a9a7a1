"""Persistent XLA compilation-cache setup, shared by the test session
(tests/conftest.py), the multiprocess children (tests/_mp_child.py) and the
driver dry-run (__graft_entry__.py).

The cache is HLO-keyed, so identical programs reload across processes and
runs instead of recompiling — on this 1-core host that is the difference
between a 1866 s cold suite and a 525 s warm one. One shared helper keeps
the three call sites from drifting (dir default, thresholds, error policy).
"""

from __future__ import annotations

import os


def enable(default_dir: str | None = None) -> str | None:
    """Point JAX at the persistent compile cache unless EXEMPLAR_JAX_CACHE=off.

    Call before the first compilation. Never raises: the cache is an
    optimization, not a dependency — on a JAX build without these config
    names the caller simply runs cold. Returns the cache dir in use, or
    None when disabled/unavailable.
    """
    import jax

    if default_dir is None:
        default_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
    cache = os.environ.get("EXEMPLAR_JAX_CACHE", default_dir)
    if cache == "off":
        return None
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        # default thresholds skip sub-second/small entries; the suite's many
        # small-but-repeated programs are exactly what we want cached
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache
