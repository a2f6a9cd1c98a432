"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests) and 64-bit precision, before JAX is imported anywhere.

Note: the axon TPU plugin in this image ignores the ``JAX_PLATFORMS``
environment variable, so the platform is also pinned via ``jax.config``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("PGPFA_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
