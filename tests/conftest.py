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

# NOTE: no persistent compilation cache here — jaxlib 0.9.0 segfaults
# deserializing cached CPU executables compiled under
# --xla_force_host_platform_device_count (reproducible on cache *hit*).


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
