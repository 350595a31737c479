"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's lack of a fake backend (SURVEY.md §4) by creating
one: all unit tests run on CPU with 8 virtual devices so multi-chip
sharding paths (`hitadv_tpu.parallel`) execute without TPU hardware.

Note: the environment's sitecustomize may import jax before this file
runs, so we update jax.config directly rather than relying on env vars.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend())
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
