"""Backend detection for kernel dispatch.

The TPU may be exposed through a plugin whose PLATFORM name is not "tpu"
(e.g. the experimental "axon" tunnel used by remote TPU pools):
`jax.default_backend()` then returns the plugin name even though the
devices are real TPUs. Round-2's `default_backend() == "tpu"` checks made
every Pallas kernel silently fall back to the XLA path on such platforms —
dispatch on the DEVICE KIND instead.
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def is_tpu() -> bool:
    """True when the default jax device is TPU silicon (any platform name)."""
    try:
        d = jax.devices()[0]
    except Exception:  # pragma: no cover - no backend at all
        return False
    kind = str(getattr(d, "device_kind", "")).lower()
    plat = str(getattr(d, "platform", "")).lower()
    return "tpu" in kind or plat == "tpu" or jax.default_backend() == "tpu"
