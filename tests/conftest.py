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
