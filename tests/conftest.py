"""Test harness: force the XLA CPU backend with 8 virtual devices so every
pjit/mesh test runs without TPU hardware (SURVEY.md §4 test strategy)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax with JAX_PLATFORMS=axon before
# conftest runs, so the env var alone is ignored; force the config instead.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def mesh8():
    from salun.dist import make_mesh

    return make_mesh(data=8, model=1)
