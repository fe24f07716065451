"""Test env: force the CPU backend with 8 virtual devices so mesh and
collective code is exercised without a TPU pod (the standard JAX testing
pattern — SURVEY.md section 4).

The container's sitecustomize registers the axon TPU plugin and sets
JAX_PLATFORMS=axon at interpreter startup (before conftest runs), so both
the env var and the live jax config must be overridden here; XLA_FLAGS is
still read lazily at first backend initialization.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
