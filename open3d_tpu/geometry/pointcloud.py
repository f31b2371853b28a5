"""PointCloud: a fixed-capacity, masked, pytree point cloud.

Reference: t/geometry/PointCloud.h:81 — attributes live in a string-keyed
TensorMap with primary key "positions". Here the container is a frozen
dataclass pytree: `positions (N,3) f32`, `mask (N,) bool`, and an `attrs`
dict for everything else (normals, colors, fpfh, ...). N is the static
capacity; invalid rows are parked at FAR_COORD (see core/masking.py).

All methods are functional (return new clouds) and jit-safe. Shape-changing
reference ops (VoxelDownSample, RemoveOutliers, ...) keep the capacity and
update the mask instead.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.core import lie
from open3d_tpu.core.masking import FAR_COORD, masked_max, masked_mean, masked_min, pad_axis0


@partial(jax.tree_util.register_dataclass, data_fields=["positions", "mask", "attrs"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class PointCloud:
    positions: jnp.ndarray  # (N, 3) float32; invalid rows at FAR_COORD
    mask: jnp.ndarray  # (N,) bool
    attrs: Dict[str, jnp.ndarray]  # each (N, ...) — "normals", "colors", ...

    # ---- construction -------------------------------------------------

    @staticmethod
    def create(
        positions,
        capacity: Optional[int] = None,
        mask=None,
        **attrs,
    ) -> "PointCloud":
        """Build from host or device arrays, padding to `capacity`."""
        positions = jnp.asarray(positions, dtype=jnp.float32)
        n = positions.shape[0]
        capacity = int(capacity) if capacity is not None else n
        if mask is None:
            mask = jnp.ones((n,), dtype=bool)
        else:
            mask = jnp.asarray(mask, dtype=bool)
        positions = pad_axis0(jnp.where(mask[:, None], positions, FAR_COORD), capacity, FAR_COORD)
        mask = pad_axis0(mask, capacity, False)
        a = {}
        for k, v in attrs.items():
            if v is None:
                continue
            v = jnp.asarray(v)
            if v.dtype == jnp.float64:
                v = v.astype(jnp.float32)
            a[k] = pad_axis0(v, capacity, 0)
        return PointCloud(positions=positions, mask=mask, attrs=a)

    # ---- basic properties ---------------------------------------------

    @property
    def capacity(self) -> int:
        return self.positions.shape[0]

    def count(self) -> jnp.ndarray:
        """Number of valid points (traced int32)."""
        return jnp.sum(self.mask.astype(jnp.int32))

    @property
    def normals(self) -> Optional[jnp.ndarray]:
        return self.attrs.get("normals")

    @property
    def colors(self) -> Optional[jnp.ndarray]:
        return self.attrs.get("colors")

    def has(self, key: str) -> bool:
        return key in self.attrs

    def with_attrs(self, **attrs) -> "PointCloud":
        new = dict(self.attrs)
        for k, v in attrs.items():
            if v is None:
                new.pop(k, None)
            else:
                new[k] = v
        return dataclasses.replace(self, attrs=new)

    def valid_positions(self, fill=FAR_COORD) -> jnp.ndarray:
        return jnp.where(self.mask[:, None], self.positions, fill)

    # ---- geometry transforms (ref: PointCloud.h:284-324) ----------------

    def transform(self, T: jnp.ndarray) -> "PointCloud":
        pos = lie.transform_points(T, self.positions)
        pos = jnp.where(self.mask[:, None], pos, FAR_COORD)
        attrs = dict(self.attrs)
        if "normals" in attrs:
            attrs["normals"] = lie.rotate_vectors(T, attrs["normals"])
        return dataclasses.replace(self, positions=pos, attrs=attrs)

    def translate(self, t: jnp.ndarray, relative: bool = True) -> "PointCloud":
        t = jnp.asarray(t, dtype=jnp.float32)
        if relative:
            pos = self.positions + t
        else:
            pos = self.positions - self.get_center() + t
        return dataclasses.replace(self, positions=jnp.where(self.mask[:, None], pos, FAR_COORD))

    def rotate(self, R: jnp.ndarray, center) -> "PointCloud":
        center = jnp.asarray(center, dtype=jnp.float32)
        pos = (self.positions - center) @ jnp.swapaxes(R, -1, -2) + center
        attrs = dict(self.attrs)
        if "normals" in attrs:
            attrs["normals"] = attrs["normals"] @ jnp.swapaxes(R, -1, -2)
        return dataclasses.replace(
            self, positions=jnp.where(self.mask[:, None], pos, FAR_COORD), attrs=attrs
        )

    def scale(self, s: float, center) -> "PointCloud":
        center = jnp.asarray(center, dtype=jnp.float32)
        pos = (self.positions - center) * s + center
        return dataclasses.replace(self, positions=jnp.where(self.mask[:, None], pos, FAR_COORD))

    # ---- bounds / stats --------------------------------------------------

    def get_min_bound(self) -> jnp.ndarray:
        return masked_min(self.positions, self.mask, axis=0)

    def get_max_bound(self) -> jnp.ndarray:
        return masked_max(self.positions, self.mask, axis=0)

    def get_center(self) -> jnp.ndarray:
        return masked_mean(self.positions, self.mask, axis=0)

    # ---- selection -------------------------------------------------------

    def select_by_mask(self, keep: jnp.ndarray) -> "PointCloud":
        """AND a boolean (N,) predicate into the validity mask."""
        mask = self.mask & keep
        return dataclasses.replace(
            self, mask=mask, positions=jnp.where(mask[:, None], self.positions, FAR_COORD)
        )

    def crop(self, min_bound, max_bound) -> "PointCloud":
        min_bound = jnp.asarray(min_bound, dtype=jnp.float32)
        max_bound = jnp.asarray(max_bound, dtype=jnp.float32)
        inside = jnp.all((self.positions >= min_bound) & (self.positions <= max_bound), axis=-1)
        return self.select_by_mask(inside)

    # ---- host interop ----------------------------------------------------

    def to_numpy(self) -> dict:
        """Gather valid rows to host numpy (breaks jit; for IO/tests)."""
        mask = np.asarray(self.mask)
        out = {"positions": np.asarray(self.positions)[mask]}
        for k, v in self.attrs.items():
            out[k] = np.asarray(v)[mask]
        return out

    def __repr__(self) -> str:  # non-traced contexts only
        try:
            n = int(self.count())
        except Exception:
            n = -1
        return f"PointCloud(capacity={self.capacity}, valid={n}, attrs={sorted(self.attrs)})"
