"""Test env: force CPU backend with 8 virtual devices so mesh/collective
code is exercised without a TPU pod (the standard JAX testing pattern —
SURVEY.md section 4). Must run before jax imports."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
