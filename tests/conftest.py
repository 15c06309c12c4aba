"""Test harness config: run JAX on a virtual 8-device CPU mesh.

The machine may ship a sitecustomize that force-registers a TPU platform and
sets ``jax_platforms`` behind our back, so env vars are not enough — override
the jax config directly before any backend is initialized.  Must run before
any test module imports jax; pytest imports conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compile cache: the CI host has ONE core, and full-model CPU
# compiles dominate suite wall time (14+ min cold).  With the cache warm the
# suite reruns in a fraction of that; entries key on HLO + jaxlib version so
# staleness self-invalidates.
jax.config.update("jax_compilation_cache_dir", "/tmp/unflow_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="also run the slow tier (multi-process distributed, full-res "
        "reference parity, optimizer-trajectory parity)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight tests excluded from the default run; select with "
        "--slow or -m slow (the pre-commit flow runs them at least once)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or "slow" in (config.option.markexpr or ""):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --slow or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
