"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding tests work without TPU hardware.

Note: this environment's sitecustomize registers a remote TPU ("axon") PJRT
plugin and forces ``jax_platforms`` to prefer it; initializing it costs ~90s of
tunnel handshake. Overriding the config value (not just the env var) before the
first backend use keeps the whole suite on fast local CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
