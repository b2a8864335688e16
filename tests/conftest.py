"""Test config: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so a
plain env var doesn't stick — override through jax.config before any backend
is initialized. XLA_FLAGS must be in the environment before the CPU client
is created.

The axon PJRT plugin is also EVICTED from the plugin registry before jax
imports: when the TPU tunnel/relay is down, plugin discovery blocks every
`jax.devices()` call even under JAX_PLATFORMS=cpu, which would hang the
whole suite (tests never touch the TPU by design).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

# drop the axon sitecustomize path + any pre-registered axon modules so the
# CPU backend never waits on the (possibly dead) TPU relay
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
for name in [m for m in list(sys.modules) if m.split(".")[0] == "axon"]:
    del sys.modules[name]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
