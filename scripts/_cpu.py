"""Import first in debug scripts: force the CPU backend with N virtual devices
(same trick as tests/conftest.py — the axon TPU plugin otherwise wins)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
_f = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _f:
    os.environ["XLA_FLAGS"] = (_f + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb
    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends
        clear_backends()
except Exception:
    pass
