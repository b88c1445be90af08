"""Test configuration: force an 8-device virtual CPU mesh.

Tests exercise the pjit/shard_map data-parallel path without TPU hardware by
splitting the host CPU into 8 XLA devices (SURVEY §4 test plan).
"""

import os

# force CPU: the harness presets JAX_PLATFORMS to the tunneled TPU backend,
# which is single-chip, slow to dial, and uses bf16 matmuls by default —
# correctness tests need the exact-math CPU backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# a pytest plugin may have imported jax before this conftest ran, freezing the
# platform from the pre-set env; override through the live config too
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    import jax
    return jax.random.PRNGKey(0)
