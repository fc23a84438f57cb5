"""Test env: force an 8-virtual-device CPU platform so pjit/mesh code paths
are exercised without TPU hardware (SURVEY.md §4).

The sandbox pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon, so env
vars alone are too late — switch the platform through jax.config before any
backend initializes."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
