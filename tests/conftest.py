"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware is a single (tunneled) chip here; tests force the CPU
backend — eager dispatch over the tunnel is orders of magnitude slower —
and multi-chip sharding paths are validated on host-platform virtual
devices, per the multi-device test strategy SURVEY.md §4 calls for.

NOTE: the environment pins JAX_PLATFORMS=axon via a site hook, so the
platform must be overridden through jax.config, not the env var.
"""

import os

# Must be set before the JAX backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite is compile-bound on this 2-vCPU
# host, and kernels rarely change between runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# The XLA:CPU JIT on long single-process runs segfaults inside
# backend_compile once enough executables have accumulated (observed
# deterministically at the ~95th test's large sharded-BA compile;
# every sub-suite passes in isolation). Dropping the in-process
# executable caches between modules keeps peak JIT state bounded; the
# persistent on-disk cache makes the recompiles cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_state():
    yield
    jax.clear_caches()
