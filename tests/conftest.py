"""Test configuration: pin JAX to a virtual 8-device CPU mesh.

The axon TPU plugin registers its PJRT client at interpreter startup (via
/root/.axon_site/sitecustomize.py), so JAX_PLATFORMS alone cannot hide the
real chip. We instead set the CPU as jax's default device; mesh tests use
jax.devices("cpu") explicitly.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: tests that need the real TPU chip")
