"""Test harness: force an 8-virtual-device CPU platform (SURVEY.md §4).

Must run before any JAX backend initialization. The axon TPU plugin
overrides JAX_PLATFORMS env vars at interpreter boot, so the config API is
used instead (verified: env vars are rewritten by /root/.axon_site's
sitecustomize; jax.config wins)."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    assert len(jax.devices()) == 8
    return jax.devices()
