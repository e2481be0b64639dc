"""Test configuration: force an 8-device virtual CPU platform.

Tests run on a virtual CPU mesh so multi-device sharding paths are exercised
without TPU hardware (the driver separately dry-runs multi-chip compilation).
CPU also gives f64, which the solver-accuracy oracle tests rely on.

NOTE: this environment exports JAX_PLATFORMS=axon (an experimental TPU tunnel
plugin) before pytest starts, and jax snapshots that env var at import — so
plain os.environ mutation here is not enough; jax.config.update is.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: the persistent compilation cache is NOT enabled on CPU —
# XLA:CPU AOT executable deserialization segfaulted two full suite runs
# (see irbfn_tpu/utils/cache.py). Cold NMPC f64 compiles make the suite
# slower but deterministic; opt back in with IRBFN_CPU_CACHE=1.
from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # no-op on CPU unless IRBFN_CPU_CACHE=1

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run @pytest.mark.slow tests (stored-oracle re-derivation"
             " — the expensive SLSQP/f64 gold solves the fast suite loads "
             "from tests/oracles/*.npz)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: re-derives stored test oracles (skipped unless "
        "--runslow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow oracle re-derivation; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables at module boundaries.

    A full single-process suite accumulates every module's jitted
    executables; by the last heavy NMPC compile the process state is large
    enough that XLA:CPU's backend_compile_and_load segfaults —
    deterministically at tests/test_solvers.py::test_nmpc_perturbation_
    optimality in a full run, never solo. Clearing per module keeps the
    resident-executable footprint bounded; cross-module recompiles are
    cheap relative to the NMPC compiles that dominate the suite."""
    yield
    jax.clear_caches()
