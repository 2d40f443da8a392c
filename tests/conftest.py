"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin and overrides
jax_platforms to "axon,cpu"; tests must run on host CPU (8 virtual devices)
so we set the config back before any backend initializes. Real-TPU
benchmarking happens in bench.py, not in tests.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
