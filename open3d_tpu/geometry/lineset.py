"""LineSet geometry, TPU-native.

Reference: t/geometry/LineSet.{h,cpp} — point positions + line index pairs
with per-point / per-line attribute TensorMaps, transform, bounds, and the
conversion helpers (from AABB/OBB wireframes, camera frustum visualization).

TPU design: fixed-capacity masked arrays like PointCloud (invalid rows
parked, boolean masks), so every op is shape-static and jittable.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from open3d_tpu.core.masking import FAR_COORD, pad_axis0


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["points", "point_mask", "lines", "line_mask", "point_attrs", "line_attrs"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class LineSet:
    """(ref: t/geometry/LineSet.h:61)"""

    points: jnp.ndarray  # (N, 3) f32; invalid rows at FAR_COORD
    point_mask: jnp.ndarray  # (N,) bool
    lines: jnp.ndarray  # (L, 2) int32
    line_mask: jnp.ndarray  # (L,) bool
    point_attrs: Dict[str, jnp.ndarray]
    line_attrs: Dict[str, jnp.ndarray]  # e.g. "colors" (L, 3)

    @staticmethod
    def create(
        points,
        lines,
        point_mask=None,
        line_mask=None,
        point_attrs: Optional[Dict] = None,
        line_attrs: Optional[Dict] = None,
        point_capacity: Optional[int] = None,
        line_capacity: Optional[int] = None,
    ) -> "LineSet":
        points = jnp.asarray(points, jnp.float32)
        lines = jnp.asarray(lines, jnp.int32)
        n, l = points.shape[0], lines.shape[0]
        pc = int(point_capacity or n)
        lc = int(line_capacity or l)
        pm = jnp.ones((n,), bool) if point_mask is None else jnp.asarray(point_mask, bool)
        lm = jnp.ones((l,), bool) if line_mask is None else jnp.asarray(line_mask, bool)
        points = pad_axis0(jnp.where(pm[:, None], points, FAR_COORD), pc, FAR_COORD)
        pm = pad_axis0(pm, pc, False)
        lines = pad_axis0(jnp.where(lm[:, None], lines, 0), lc, 0)
        lm = pad_axis0(lm, lc, False)
        pa = {
            k: pad_axis0(jnp.asarray(v, jnp.float32), pc, 0)
            for k, v in (point_attrs or {}).items()
        }
        la = {
            k: pad_axis0(jnp.asarray(v, jnp.float32), lc, 0)
            for k, v in (line_attrs or {}).items()
        }
        return LineSet(
            points=points, point_mask=pm, lines=lines, line_mask=lm,
            point_attrs=pa, line_attrs=la,
        )

    # ---- queries ------------------------------------------------------

    def num_points(self) -> jnp.ndarray:
        return jnp.sum(self.point_mask.astype(jnp.int32))

    def num_lines(self) -> jnp.ndarray:
        return jnp.sum(self.line_mask.astype(jnp.int32))

    def get_min_bound(self) -> jnp.ndarray:
        return jnp.min(
            jnp.where(self.point_mask[:, None], self.points, jnp.inf), axis=0
        )

    def get_max_bound(self) -> jnp.ndarray:
        return jnp.max(
            jnp.where(self.point_mask[:, None], self.points, -jnp.inf), axis=0
        )

    def line_lengths(self) -> jnp.ndarray:
        a = self.points[self.lines[:, 0]]
        b = self.points[self.lines[:, 1]]
        return jnp.where(self.line_mask, jnp.linalg.norm(b - a, axis=-1), 0.0)

    # ---- transforms (ref: LineSet::Transform/Translate/Scale/Rotate) --

    def transform(self, T: jnp.ndarray) -> "LineSet":
        R, t = T[:3, :3], T[:3, 3]
        p = self.points @ R.T + t
        p = jnp.where(self.point_mask[:, None], p, FAR_COORD)
        return dataclasses.replace(self, points=p)

    def translate(self, t, relative: bool = True) -> "LineSet":
        t = jnp.asarray(t, jnp.float32)
        if not relative:
            c = 0.5 * (self.get_min_bound() + self.get_max_bound())
            t = t - c
        p = jnp.where(self.point_mask[:, None], self.points + t, FAR_COORD)
        return dataclasses.replace(self, points=p)

    def scale(self, s: float, center=None) -> "LineSet":
        c = (
            0.5 * (self.get_min_bound() + self.get_max_bound())
            if center is None
            else jnp.asarray(center, jnp.float32)
        )
        p = c + s * (self.points - c)
        p = jnp.where(self.point_mask[:, None], p, FAR_COORD)
        return dataclasses.replace(self, points=p)

    def rotate(self, R: jnp.ndarray, center=None) -> "LineSet":
        c = (
            0.5 * (self.get_min_bound() + self.get_max_bound())
            if center is None
            else jnp.asarray(center, jnp.float32)
        )
        p = c + (self.points - c) @ jnp.asarray(R, jnp.float32).T
        p = jnp.where(self.point_mask[:, None], p, FAR_COORD)
        return dataclasses.replace(self, points=p)

    # ---- converters ---------------------------------------------------

    @staticmethod
    def from_bounding_box(box) -> "LineSet":
        """Wireframe of an AABB / OBB (ref: LineSet::CreateFromAxisAligned/
        OrientedBoundingBox, geometry/LineSet.cpp factory helpers)."""
        corners = box.get_box_points()  # (8, 3); bit layout: bit a = +axis a
        edges = []
        for c in range(8):
            for a in range(3):
                d = c | (1 << a)
                if d != c:
                    edges.append((c, d))
        return LineSet.create(corners, jnp.asarray(edges, jnp.int32))

    @staticmethod
    def create_camera_visualization(
        intrinsic, extrinsic: jnp.ndarray, scale: float = 0.1
    ) -> "LineSet":
        """Frustum wireframe (ref: LineSet::CreateCameraVisualization,
        t/geometry/LineSet.cpp)."""
        W, H = intrinsic.width, intrinsic.height
        corners_px = jnp.asarray(
            [[0.0, 0.0], [W, 0.0], [W, H], [0.0, H]], jnp.float32
        )
        x = (corners_px[:, 0] - intrinsic.cx) / intrinsic.fx
        y = (corners_px[:, 1] - intrinsic.cy) / intrinsic.fy
        frustum_cam = jnp.concatenate(
            [jnp.zeros((1, 3)), jnp.stack([x, y, jnp.ones(4)], axis=-1) * scale]
        )  # (5, 3): apex + 4 image corners at depth `scale`
        R = extrinsic[:3, :3]
        t = extrinsic[:3, 3]
        pts = (frustum_cam - t) @ R  # camera -> world (R^T (p - t))
        lines = jnp.asarray(
            [[0, 1], [0, 2], [0, 3], [0, 4], [1, 2], [2, 3], [3, 4], [4, 1]],
            jnp.int32,
        )
        return LineSet.create(pts, lines)

    def to_numpy(self):
        import numpy as np

        pm = np.asarray(self.point_mask)
        lm = np.asarray(self.line_mask)
        return np.asarray(self.points)[pm], np.asarray(self.lines)[lm]
