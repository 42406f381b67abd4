"""Test harness: run everything on a simulated 8-device CPU platform.

The container boots an `axon` TPU PJRT plugin via sitecustomize and pins
``jax_platforms`` to it; unit tests must be fast and hardware-independent, so
we force the CPU backend (with 8 virtual devices — the TPU-native analog of
"test multi-node without a real cluster", SURVEY.md §4) before any test code
touches a device.  XLA_FLAGS must be in the environment before backend init.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
