"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware (a single chip in this environment) is exercised by
``bench.py``; unit tests use the CPU backend with 8 virtual devices so that
sharding/collective code paths compile and execute exactly as they would on
an 8-chip slice (same SPMD program, different target).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin in this environment ignores JAX_PLATFORMS set after
# interpreter start; force the CPU backend through the config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled-executable caches after each test module.

    A full-suite run accumulates thousands of jitted programs (the E2E
    tests alone jit per (config, subframe, softbuffer) key); with all of
    them live in one process, XLA:CPU eventually segfaults inside
    backend_compile_and_load (~462 tests in).  Per-module clearing keeps
    the working set bounded without re-compiling within a module.
    """
    yield
    jax.clear_caches()
