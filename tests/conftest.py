"""Test harness: virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised on a CPU-backed fake mesh
(SURVEY.md §4); the real chip is only used by bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
