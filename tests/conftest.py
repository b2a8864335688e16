"""Test config: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so a
plain env var doesn't stick — override through jax.config before any backend
is initialized. XLA_FLAGS must be in the environment before the CPU client
is created.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
