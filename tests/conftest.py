"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference could never test its CUDA extensions without a GPU; our
pure-JAX/Pallas-with-interpret design runs the full stack on CPU, including
multi-device sharding tests via xla_force_host_platform_device_count.

Note: this environment's sitecustomize imports jax and registers a TPU
backend at interpreter start, so env vars are too late here — but backend
*initialization* is lazy, so jax.config.update still wins as long as no
test module touches a device at import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
