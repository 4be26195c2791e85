"""Test harness: virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised on a CPU-backed fake mesh
(SURVEY.md §4); the real chip is only used by bench.py.

The host image pins the real TPU chip via a sitecustomize that registers the
'axon' backend at interpreter start and forces jax_platforms='axon,cpu', so
env vars alone don't stick.  Backend *clients* are created lazily though —
overriding jax.config before any jax.devices() call reliably selects the
8-device CPU platform.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"
