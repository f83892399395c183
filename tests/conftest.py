"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run anywhere (the TPU chip is reserved for benchmarks).

The environment preloads jax via sitecustomize with JAX_PLATFORMS=axon
(a tunneled TPU with slow remote compiles), so env vars alone are too late:
jax is already imported. `jax.config.update` before any backend is touched
still wins.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
