"""Test configuration.

Runs all JAX tests on a virtual 8-device CPU mesh (the standard
fake-backend trick for testing multi-chip sharding without hardware;
see SURVEY.md §4).  Must set XLA flags before jax is imported anywhere.
"""

import os
import sys

# The harness environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU) via
# a sitecustomize that registers the PJRT plugin at interpreter start, so the
# env var alone cannot be overridden here — use jax.config, which wins as
# long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU backend, got "
    f"{jax.devices()}")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {len(jax.devices())}")
