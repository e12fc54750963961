"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
multi-chip sharding paths compile and execute without TPU hardware.

The environment presets JAX_PLATFORMS=axon (the real chip) and a startup
hook reads it before conftest runs, so jax.config.update is required in
addition to the env vars (which cover subprocesses).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
