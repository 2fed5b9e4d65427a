"""Test config: run on a virtual 8-device CPU mesh.

Must set env before jax is imported anywhere (reference test strategy:
SURVEY.md §4 — multi-device tests on CPU via
``xla_force_host_platform_device_count``).
"""
import os

# Force CPU: the session env points JAX_PLATFORMS at a tunneled TPU (axon),
# which is far too slow for per-op test dispatch, and sitecustomize re-registers
# it in every process — so override the config after import, not just the env.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
