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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test FILES.

    A full single-process suite run accumulates hundreds of CPU
    executables; past ~85% of the suite the XLA CPU backend became
    unstable on this machine (one run stuck >15 min inside
    backend_compile, one SIGSEGV inside a compiled computation — both in
    late files that pass standalone and in a two-process split).
    Dropping the caches at module boundaries bounds the accumulation;
    the cost is re-compiling shapes shared across files (~tiny models,
    seconds). For parallel runs, pytest-xdist is available:
    ``pytest tests/ -n 4`` splits files across fresh workers.
    """
    yield
    jax.clear_caches()
