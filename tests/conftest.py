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


@pytest.fixture(autouse=True)
def _restore_global_knobs():
    """Snapshot/restore the package's three module-global dials around
    every test. Round-5 post-mortem: `test_bench_mfu_failure_is_loud`
    runs `bench.main()` in-process, and bench sets the production
    compute dtype (`nnF.set_compute_dtype(bfloat16)`, bench.py) without
    restoring it — 20 downstream torch-parity tests then silently ran
    their models in bf16 (2.6e-3 logit drift). Any test may flip these
    knobs; none may leak them."""
    from hitadv_tpu.nn import functional as nnF
    from hitadv_tpu.ops import geometry as G
    from hitadv_tpu.ops import pallas_kernels as pk

    dtype = nnF.get_compute_dtype()
    backend = G._BACKEND
    layout = pk._EXTRACT_LAYOUT
    try:
        yield
    finally:
        nnF.set_compute_dtype(dtype)
        G.set_backend(backend)
        pk.set_extract_layout(layout)
