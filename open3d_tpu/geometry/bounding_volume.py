"""Axis-aligned and oriented bounding boxes, TPU-native.

Reference: t/geometry/BoundingVolume.h — AxisAlignedBoundingBox
(min_bound/max_bound; :46) and OrientedBoundingBox (center/rotation/extent;
:257), with GetBoxPoints, Volume, GetPointIndicesWithinBoundingBox,
CreateFromPoints, and the minimal-OBB solvers
(t/geometry/kernel/MinimumOBB.cpp: ComputeMinimumOBBJylanki exact /
ComputeMinimumOBBApprox hull-face sweep).

TPU design: boxes are small frozen pytrees; every query
(contains/indices-within) is a vectorized mask over fixed-capacity point
arrays. The minimal OBB uses the approx algorithm as one BATCHED volume
evaluation over all hull-face candidate frames (one (F, 3, 3) rotation
stack x one (F, N) projection pass — an MXU matmul), instead of the
reference's sequential loop over faces.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["min_bound", "max_bound"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class AxisAlignedBoundingBox:
    """(ref: t/geometry/BoundingVolume.h:46)"""

    min_bound: jnp.ndarray  # (3,) f32
    max_bound: jnp.ndarray  # (3,) f32

    @staticmethod
    def create_from_points(
        points: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> "AxisAlignedBoundingBox":
        """(ref: AxisAlignedBoundingBox::CreateFromPoints, BoundingVolume.cpp:46)"""
        p = jnp.asarray(points, jnp.float32)
        if mask is not None:
            lo = jnp.min(jnp.where(mask[:, None], p, jnp.inf), axis=0)
            hi = jnp.max(jnp.where(mask[:, None], p, -jnp.inf), axis=0)
        else:
            lo = jnp.min(p, axis=0)
            hi = jnp.max(p, axis=0)
        return AxisAlignedBoundingBox(min_bound=lo, max_bound=hi)

    def get_center(self) -> jnp.ndarray:
        return 0.5 * (self.min_bound + self.max_bound)

    def get_extent(self) -> jnp.ndarray:
        return self.max_bound - self.min_bound

    def get_half_extent(self) -> jnp.ndarray:
        return 0.5 * self.get_extent()

    def get_max_extent(self) -> jnp.ndarray:
        return jnp.max(self.get_extent())

    def volume(self) -> jnp.ndarray:
        return jnp.prod(jnp.maximum(self.get_extent(), 0.0))

    def get_box_points(self) -> jnp.ndarray:
        """(8, 3) corners (ref: GetBoxPoints, BoundingVolume.cpp:180)."""
        lo, hi = self.min_bound, self.max_bound
        sel = jnp.asarray(
            [[(c >> a) & 1 for a in range(3)] for c in range(8)], jnp.float32
        )
        return lo + sel * (hi - lo)

    def contains(self, points: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(
            (points >= self.min_bound) & (points <= self.max_bound), axis=-1
        )

    def get_point_indices_within_bounding_box(
        self, points: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Boolean membership mask (the fixed-capacity analog of the
        reference's index list, BoundingVolume.cpp:203)."""
        inside = self.contains(points)
        return inside if mask is None else inside & mask

    def scale(self, s: float, center: Optional[jnp.ndarray] = None):
        c = self.get_center() if center is None else center
        return AxisAlignedBoundingBox(
            min_bound=c + s * (self.min_bound - c),
            max_bound=c + s * (self.max_bound - c),
        )

    def translate(self, t: jnp.ndarray, relative: bool = True):
        t = jnp.asarray(t, jnp.float32)
        if relative:
            return AxisAlignedBoundingBox(self.min_bound + t, self.max_bound + t)
        shift = t - self.get_center()
        return AxisAlignedBoundingBox(self.min_bound + shift, self.max_bound + shift)

    def get_oriented_bounding_box(self) -> "OrientedBoundingBox":
        return OrientedBoundingBox(
            center=self.get_center(),
            rotation=jnp.eye(3, dtype=jnp.float32),
            extent=self.get_extent(),
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["center", "rotation", "extent"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class OrientedBoundingBox:
    """(ref: t/geometry/BoundingVolume.h:257)"""

    center: jnp.ndarray  # (3,)
    rotation: jnp.ndarray  # (3, 3), columns = box axes
    extent: jnp.ndarray  # (3,) full edge lengths

    @staticmethod
    def create_from_axis_aligned_bounding_box(aabb: AxisAlignedBoundingBox):
        return aabb.get_oriented_bounding_box()

    @staticmethod
    def create_from_points(
        points: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> "OrientedBoundingBox":
        """PCA box (ref: OrientedBoundingBox::CreateFromPoints,
        BoundingVolume.cpp:257 — mean + covariance eigenbasis, then tight
        extents along the eigen axes)."""
        p = jnp.asarray(points, jnp.float32)
        if mask is None:
            mask = jnp.ones(p.shape[:1], bool)
        w = mask.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(w), 1.0)
        mu = jnp.sum(p * w[:, None], axis=0) / n
        d = jnp.where(mask[:, None], p - mu, 0.0)
        cov = d.T @ d / n
        _, evecs = jnp.linalg.eigh(cov)
        R = evecs  # columns ascending eigenvalue; right-handed-ness fixed below
        R = jnp.where(jnp.linalg.det(R) < 0, R.at[:, 0].multiply(-1.0), R)
        q = d @ R  # coords in box frame
        lo = jnp.min(jnp.where(mask[:, None], q, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(mask[:, None], q, -jnp.inf), axis=0)
        center = mu + R @ ((lo + hi) * 0.5)
        return OrientedBoundingBox(center=center, rotation=R, extent=hi - lo)

    @staticmethod
    def create_minimal(
        points: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> "OrientedBoundingBox":
        """Approximate minimal-volume OBB (ref: ComputeMinimumOBBApprox,
        t/geometry/kernel/MinimumOBB.cpp:1248 — sweep hull-face frames).

        Host step: convex hull (Qhull, like the reference). Device step:
        evaluate ALL candidate frames in one batch — for each hull face,
        the frame is (face normal n, longest-edge-projected axis, n x a) —
        and keep the minimum-volume frame.
        """
        from open3d_tpu.ops.segmentation import compute_convex_hull

        pts_np = np.asarray(points, np.float32)
        msk_np = None if mask is None else np.asarray(mask, bool)
        hv, ht, _ = compute_convex_hull(pts_np, msk_np)
        hv = jnp.asarray(hv, jnp.float32)  # (V, 3) hull vertices
        tri = jnp.asarray(ht, jnp.int32)  # (F, 3)

        a = hv[tri[:, 0]]
        b = hv[tri[:, 1]]
        c = hv[tri[:, 2]]
        n = jnp.cross(b - a, c - a)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        e = b - a
        u = e - n * jnp.sum(e * n, axis=-1, keepdims=True)
        u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
        v = jnp.cross(n, u)
        R = jnp.stack([u, v, n], axis=-1)  # (F, 3, 3) candidate frames

        q = jnp.einsum("vk,fkj->fvj", hv, R)  # (F, V, 3) hull verts per frame
        lo = jnp.min(q, axis=1)
        hi = jnp.max(q, axis=1)
        vol = jnp.prod(hi - lo, axis=-1)
        best = jnp.argmin(vol)
        Rb, lob, hib = R[best], lo[best], hi[best]
        Rb = jnp.where(jnp.linalg.det(Rb) < 0, Rb.at[:, 0].multiply(-1.0), Rb)
        qb = hv @ Rb
        lob = jnp.min(qb, axis=0)
        hib = jnp.max(qb, axis=0)
        center = Rb @ ((lob + hib) * 0.5)
        return OrientedBoundingBox(center=center, rotation=Rb, extent=hib - lob)

    def volume(self) -> jnp.ndarray:
        return jnp.prod(jnp.maximum(self.extent, 0.0))

    def get_box_points(self) -> jnp.ndarray:
        sel = jnp.asarray(
            [[(c >> a) & 1 for a in range(3)] for c in range(8)], jnp.float32
        )
        local = (sel - 0.5) * self.extent
        return self.center + local @ self.rotation.T

    def contains(self, points: jnp.ndarray) -> jnp.ndarray:
        q = (points - self.center) @ self.rotation  # box frame
        h = 0.5 * self.extent
        return jnp.all(jnp.abs(q) <= h + 1e-7, axis=-1)

    def get_point_indices_within_bounding_box(
        self, points: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        inside = self.contains(points)
        return inside if mask is None else inside & mask

    def get_axis_aligned_bounding_box(self) -> AxisAlignedBoundingBox:
        return AxisAlignedBoundingBox.create_from_points(self.get_box_points())

    def rotate(self, R: jnp.ndarray, center: Optional[jnp.ndarray] = None):
        c = self.center if center is None else jnp.asarray(center, jnp.float32)
        return OrientedBoundingBox(
            center=c + R @ (self.center - c),
            rotation=R @ self.rotation,
            extent=self.extent,
        )

    def translate(self, t: jnp.ndarray, relative: bool = True):
        t = jnp.asarray(t, jnp.float32)
        center = self.center + t if relative else t
        return OrientedBoundingBox(center=center, rotation=self.rotation, extent=self.extent)

    def transform(self, T: jnp.ndarray):
        R, t = T[:3, :3], T[:3, 3]
        return OrientedBoundingBox(
            center=R @ self.center + t,
            rotation=R @ self.rotation,
            extent=self.extent,
        )
