"""Fixed-capacity buffer idiom.

XLA traces static shapes, so every "N points" container in this framework is a
fixed-capacity array plus a validity mask (SURVEY.md section 7, "Hard parts").
Invalid (padding) point coordinates are parked at FAR_COORD so they can never
fall inside any radius/k-NN query or camera frustum, which lets most kernels
skip explicit mask plumbing.

The reference instead resizes std::vector / reallocates Tensors per call
(e.g. t/geometry/PointCloud.cpp VoxelDownSample returns a freshly-sized cloud);
that pattern is hostile to a compile-once runtime, hence this idiom.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Padding coordinate for invalid points: far outside any plausible scene,
# but small enough that squared distances (~1e17) stay finite in float32.
FAR_COORD = 3.0e8


def round_up(x: int, multiple: int) -> int:
    return int(math.ceil(x / multiple) * multiple)


def pad_axis0(x: jnp.ndarray, capacity: int, fill_value) -> jnp.ndarray:
    """Pad (or truncate) axis 0 to `capacity` with `fill_value`."""
    n = x.shape[0]
    if n == capacity:
        return x
    if n > capacity:
        return x[:capacity]
    pad_shape = (capacity - n,) + x.shape[1:]
    return jnp.concatenate([x, jnp.full(pad_shape, fill_value, dtype=x.dtype)], axis=0)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=0, keepdims=False):
    """Mean of x over `axis` counting only mask==True rows."""
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    total = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    count = jnp.sum(m, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, 1.0)


def masked_min(x: jnp.ndarray, mask: jnp.ndarray, axis=0, big=jnp.inf):
    m = mask
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.min(jnp.where(m, x, big), axis=axis)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis=0, small=-jnp.inf):
    m = mask
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.max(jnp.where(m, x, small), axis=axis)


def compact_indices(mask: jnp.ndarray, capacity: int):
    """Stable-compact True positions of `mask` into the first `count` slots.

    Returns (indices (capacity,) int32, count int32). indices[i] for
    i >= count points at the last element (harmless gather target); consumers
    must pair with the returned count / a fresh mask.
    This is the static-shape replacement for the reference's
    GetActiveIndices / NonZero kernels.
    """
    n = mask.shape[0]
    order = jnp.argsort(~mask, stable=True)  # True (0) first, stable keeps order
    count = jnp.sum(mask.astype(jnp.int32))
    idx = order[:capacity] if capacity <= n else pad_axis0(order, capacity, n - 1)
    idx = jnp.where(jnp.arange(capacity) < count, idx, jnp.minimum(n - 1, idx))
    return idx.astype(jnp.int32), jnp.minimum(count, capacity)
