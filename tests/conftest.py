"""Test configuration: force an 8-device virtual CPU mesh BEFORE backend init.

Mirrors the reference's device-permutation test strategy (SURVEY.md section 4):
CPU-jax is the reference implementation; TPU runs are cross-checked by running
the same suite on hardware. Multi-device sharding tests use the 8 virtual CPU
devices.

The driver environment pins JAX_PLATFORMS=axon and a sitecustomize hook
registers the axon TPU plugin at interpreter start (before this file runs), so
plain env-var edits are not enough: we also rewrite the live jax config and
clear any initialized backends so the CPU platform takes effect.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:  # pragma: no cover - internal API drift
    pass


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
