"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count=8`` (the driver separately dry-runs
the multi-chip path); benches run on real TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force the CPU backend via config, not the JAX_PLATFORMS env var: managed
# TPU environments (e.g. the axon relay) pre-set JAX_PLATFORMS and would
# silently route "CPU" tests onto the real chip — serializing the suite
# through one device and racing any concurrent benchmark.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is XLA:CPU-compile-bound (a full
# cold run is ~45 min serial; warm re-runs measure ~2.1-2.6x faster).  An
# earlier jaxlib segfault on CPU-executable cache hits under
# --xla_force_host_platform_device_count no longer reproduces (stress-
# tested: mesh-heavy + pallas-interpret files, two full passes).
# MYZKP_TEST_CACHE=off disables the cache entirely (escape hatch if a
# jaxlib bump reintroduces the segfault, advisor r3); any other value
# relocates the directory.
_cache = os.environ.get("MYZKP_TEST_CACHE", "/tmp/jax_myzkp_test_cache")
if _cache.lower() != "off":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402

# XLA:CPU's thunk runtime JIT-loads one tiny LLVM module (3 mmaps) per fused
# computation; a compile-heavy module like test_kzg_gemini creates ~19k
# modules (~57k mappings) and blows through the kernel's default
# vm.max_map_count of 65530 — mmap then fails ENOMEM and LLVM aborts the
# process mid-compile ("LLVM compilation error: Cannot allocate memory").
# Raise the limit when we can (this environment runs tests as root);
# harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1_048_576:
            _f.seek(0)
            _f.write("1048576")
except OSError:
    pass


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables (and their JIT mappings) between modules.

    Keeps the process's live-executable footprint bounded — the same
    accumulation that motivates the max_map_count raise above.
    """
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
