"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-device sharding tests use the virtual CPU mesh; numerical parity tests
compare against torch CPU goldens (f32 everywhere, no TPU needed).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env pre-sets the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process compiles)"
    )

# The axon sitecustomize force-registers the TPU backend via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start — the
# env var alone is ignored. Re-update AFTER import to truly run on CPU (needed
# for the 8-device virtual mesh and full-precision goldens).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
