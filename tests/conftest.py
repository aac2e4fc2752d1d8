"""Test harness config: force CPU backend with 8 virtual devices and f64.

Multi-chip sharding is validated on a virtual CPU mesh
(--xla_force_host_platform_device_count=8); the f64 oracle path needs
jax_enable_x64. The axon TPU plugin's sitecustomize imports jax at interpreter
startup with JAX_PLATFORMS=axon already read, so env-var overrides are too
late — the platform must be switched through jax.config before any backend
client is created (XLA_FLAGS is still read lazily at CPU-client creation).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests need 8 virtual CPU devices"

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run slow canonical gates (10,000-iteration golden loop, soaks)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running canonical gate (needs --runslow)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow canonical gate; run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap cumulative in-process compile state: the full suite compiles
    many hundreds of programs in one process and jaxlib's CPU compile
    crashed (SIGSEGV/SIGABRT inside backend_compile) once the round-5
    tests pushed the count high enough — clearing jit/pjit caches at
    module boundaries keeps the executable count bounded at the cost of
    a few re-traces of shared helpers."""
    yield
    import jax

    jax.clear_caches()
