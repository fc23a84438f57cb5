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

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bound_jit_mappings():
    """Keep the process under vm.max_map_count.

    Every XLA:CPU executable pins a handful of anonymous LLVM-JIT code
    mappings for as long as the jit cache holds it; a full suite run
    compiles tens of thousands of them and crosses the kernel's
    vm.max_map_count (65530 default), after which mmap fails inside the
    next compile and the process segfaults (observed deterministically at
    ~143 tests in). Dropping the compilation caches once the mapping count
    gets close keeps the suite bounded without paying recompiles early.
    """
    yield
    try:
        with open("/proc/self/maps") as f:
            n_maps = sum(1 for _ in f)
    except OSError:
        return
    if n_maps > 40_000:
        gc.collect()
        jax.clear_caches()
