"""TriangleMesh: fixed-capacity masked triangle mesh, TPU-native.

Reference surface: t/geometry/TriangleMesh.{h,cpp} (TriangleMesh.h:97) —
vertex/triangle TensorMaps, ComputeVertexNormals/ComputeTriangleNormals,
GetSurfaceArea, SamplePointsUniformly, Transform, ComputeMetrics
(Chamfer/Hausdorff/F-score, TriangleMesh.h:1136 + kernel/Metrics.h:20).

TPU design: same masked fixed-capacity pytree idiom as PointCloud. Triangle
soup is the native form produced by TSDF extraction (marching tetrahedra);
`compact()` dedups shared vertices on host for IO.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.core import lie, nns
from open3d_tpu.geometry.pointcloud import PointCloud


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vertices", "triangles", "vertex_mask", "triangle_mask", "vertex_attrs", "triangle_attrs"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class TriangleMesh:
    vertices: jnp.ndarray  # (V, 3) f32
    triangles: jnp.ndarray  # (T, 3) int32 vertex ids
    vertex_mask: jnp.ndarray  # (V,) bool
    triangle_mask: jnp.ndarray  # (T,) bool
    vertex_attrs: Dict[str, jnp.ndarray]
    triangle_attrs: Dict[str, jnp.ndarray]

    @staticmethod
    def create(vertices, triangles, vertex_attrs=None, triangle_attrs=None,
               vertex_mask=None, triangle_mask=None) -> "TriangleMesh":
        vertices = jnp.asarray(vertices, jnp.float32)
        triangles = jnp.asarray(triangles, jnp.int32)
        V, T = vertices.shape[0], triangles.shape[0]
        return TriangleMesh(
            vertices=vertices,
            triangles=triangles,
            vertex_mask=jnp.ones((V,), bool) if vertex_mask is None else jnp.asarray(vertex_mask, bool),
            triangle_mask=jnp.ones((T,), bool) if triangle_mask is None else jnp.asarray(triangle_mask, bool),
            vertex_attrs={k: jnp.asarray(v) for k, v in (vertex_attrs or {}).items()},
            triangle_attrs={k: jnp.asarray(v) for k, v in (triangle_attrs or {}).items()},
        )

    @staticmethod
    def from_triangle_soup(tri_verts, tri_mask, colors=None) -> "TriangleMesh":
        """(T, 3, 3) per-triangle vertex soup -> mesh with V = 3T vertices."""
        tri_verts = jnp.asarray(tri_verts, jnp.float32)
        T = tri_verts.shape[0]
        vattrs = {}
        if colors is not None:
            vattrs["colors"] = jnp.asarray(colors, jnp.float32).reshape(3 * T, 3)
        return TriangleMesh(
            vertices=tri_verts.reshape(3 * T, 3),
            triangles=jnp.arange(3 * T, dtype=jnp.int32).reshape(T, 3),
            vertex_mask=jnp.repeat(jnp.asarray(tri_mask, bool), 3),
            triangle_mask=jnp.asarray(tri_mask, bool),
            vertex_attrs=vattrs,
            triangle_attrs={},
        )

    # ---- counts -------------------------------------------------------

    def num_vertices(self) -> jnp.ndarray:
        return jnp.sum(self.vertex_mask.astype(jnp.int32))

    def num_triangles(self) -> jnp.ndarray:
        return jnp.sum(self.triangle_mask.astype(jnp.int32))

    # ---- geometry -----------------------------------------------------

    def _tri_corners(self):
        tri = jnp.maximum(self.triangles, 0)
        return self.vertices[tri[:, 0]], self.vertices[tri[:, 1]], self.vertices[tri[:, 2]]

    def compute_triangle_normals(self) -> "TriangleMesh":
        """(ref: TriangleMesh::ComputeTriangleNormals)"""
        a, b, c = self._tri_corners()
        n = jnp.cross(b - a, c - a)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        n = jnp.where(self.triangle_mask[:, None], n, 0.0)
        return dataclasses.replace(self, triangle_attrs={**self.triangle_attrs, "normals": n})

    def compute_vertex_normals(self) -> "TriangleMesh":
        """Area-weighted incident-triangle normals
        (ref: TriangleMesh::ComputeVertexNormals)."""
        a, b, c = self._tri_corners()
        fn = jnp.cross(b - a, c - a)  # area-weighted
        fn = jnp.where(self.triangle_mask[:, None], fn, 0.0)
        vn = jnp.zeros_like(self.vertices)
        tri = jnp.maximum(self.triangles, 0)
        for k in range(3):
            vn = vn.at[tri[:, k]].add(fn)
        vn = vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
        vn = jnp.where(self.vertex_mask[:, None], vn, 0.0)
        return dataclasses.replace(self, vertex_attrs={**self.vertex_attrs, "normals": vn})

    def triangle_areas(self) -> jnp.ndarray:
        a, b, c = self._tri_corners()
        ar = 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)
        return jnp.where(self.triangle_mask, ar, 0.0)

    def surface_area(self) -> jnp.ndarray:
        """(ref: TriangleMesh::GetSurfaceArea)"""
        return jnp.sum(self.triangle_areas())

    def transform(self, T: jnp.ndarray) -> "TriangleMesh":
        v = lie.transform_points(T, self.vertices)
        va = dict(self.vertex_attrs)
        if "normals" in va:
            va["normals"] = lie.rotate_vectors(T, va["normals"])
        return dataclasses.replace(self, vertices=v, vertex_attrs=va)

    def sample_points_uniformly(self, number_of_points: int, key=None) -> PointCloud:
        """Area-weighted barycentric sampling
        (ref: TriangleMesh::SamplePointsUniformly)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        areas = self.triangle_areas()
        p = areas / jnp.maximum(jnp.sum(areas), 1e-12)
        tid = jax.random.choice(k1, areas.shape[0], (number_of_points,), p=p)
        a, b, c = self._tri_corners()
        u = jax.random.uniform(k2, (number_of_points, 2))
        # uniform barycentric: fold the square onto the triangle
        su = jnp.sqrt(u[:, 0])
        w0, w1, w2 = 1.0 - su, su * (1.0 - u[:, 1]), su * u[:, 1]
        pts = w0[:, None] * a[tid] + w1[:, None] * b[tid] + w2[:, None] * c[tid]
        return PointCloud.create(pts, mask=self.triangle_mask[tid])

    def sample_points_poisson_disk(
        self, number_of_points: int, init_factor: int = 5, key=None
    ) -> PointCloud:
        """Blue-noise-ish surface sampling (ref:
        TriangleMesh::SamplePointsPoissonDisk,
        geometry/TriangleMeshFactory... legacy SamplePointsPoissonDisk —
        Yuksel sample elimination). The reference eliminates samples
        through a sequential weight heap; here `init_factor *
        number_of_points` uniform samples are thinned by farthest-point
        selection — the same oversample-then-eliminate shape with a
        data-parallel eliminator (FPS maximizes minimum pairwise distance,
        the Poisson-disk property)."""
        from open3d_tpu.ops import pointcloud as _pc_ops

        dense = self.sample_points_uniformly(
            init_factor * number_of_points, key=key
        )
        return _pc_ops.farthest_point_down_sample(dense, number_of_points)

    def get_min_bound(self) -> jnp.ndarray:
        v = jnp.where(self.vertex_mask[:, None], self.vertices, jnp.inf)
        return jnp.min(v, axis=0)

    def get_max_bound(self) -> jnp.ndarray:
        v = jnp.where(self.vertex_mask[:, None], self.vertices, -jnp.inf)
        return jnp.max(v, axis=0)

    # ---- host-side ----------------------------------------------------

    def compact(self, decimals: int = 6):
        """Host-side: drop masked rows and merge duplicate vertices.
        Returns (vertices (V', 3) np, triangles (T', 3) np)."""
        v = np.asarray(self.vertices)
        t = np.asarray(self.triangles)
        vm = np.asarray(self.vertex_mask)
        tm = np.asarray(self.triangle_mask)
        t = t[tm]
        key = np.round(v, decimals)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        # representative position per unique key (first occurrence)
        first = np.full(uniq.shape[0], -1, np.int64)
        seen = np.zeros(uniq.shape[0], bool)
        order = np.arange(v.shape[0])
        for i in order[vm]:
            if not seen[inv[i]]:
                seen[inv[i]] = True
                first[inv[i]] = i
        remap = inv
        new_tris = remap[t]
        # drop degenerate triangles
        good = (
            (new_tris[:, 0] != new_tris[:, 1])
            & (new_tris[:, 1] != new_tris[:, 2])
            & (new_tris[:, 0] != new_tris[:, 2])
        )
        new_tris = new_tris[good]
        used = np.zeros(uniq.shape[0], bool)
        used[new_tris.reshape(-1)] = True
        old2new = np.cumsum(used) - 1
        verts = np.where(first[used][:, None] >= 0, v[np.maximum(first[used], 0)], uniq[used])
        return verts.astype(np.float32), old2new[new_tris].astype(np.int32)


# ---------------------------------------------------------------------------
# Metrics (ref: t/geometry/kernel/Metrics.h:20, TriangleMesh.h:1136)
# ---------------------------------------------------------------------------


class GeometryMetrics(NamedTuple):
    chamfer_distance: jnp.ndarray
    hausdorff_distance: jnp.ndarray
    fscore: jnp.ndarray


def compute_metrics_point_cloud(
    a: PointCloud, b: PointCloud, fscore_radius: float = 0.01
) -> GeometryMetrics:
    """Chamfer / Hausdorff / F-score between two point sets
    (ref: ComputeMetrics, t/geometry/kernel/Metrics.cpp — metrics are
    computed over sampled point sets for meshes)."""
    _, d2_ab = nns.one_nn_search(a.positions, b.positions, target_mask=b.mask)
    _, d2_ba = nns.one_nn_search(b.positions, a.positions, target_mask=a.mask)
    d_ab = jnp.sqrt(jnp.maximum(d2_ab, 0.0))
    d_ba = jnp.sqrt(jnp.maximum(d2_ba, 0.0))
    na = jnp.maximum(jnp.sum(a.mask), 1)
    nb = jnp.maximum(jnp.sum(b.mask), 1)
    mean_ab = jnp.sum(jnp.where(a.mask, d_ab, 0.0)) / na
    mean_ba = jnp.sum(jnp.where(b.mask, d_ba, 0.0)) / nb
    chamfer = mean_ab + mean_ba
    haus = jnp.maximum(
        jnp.max(jnp.where(a.mask, d_ab, 0.0)), jnp.max(jnp.where(b.mask, d_ba, 0.0))
    )
    prec = jnp.sum(jnp.where(a.mask, (d_ab < fscore_radius).astype(jnp.float32), 0.0)) / na
    rec = jnp.sum(jnp.where(b.mask, (d_ba < fscore_radius).astype(jnp.float32), 0.0)) / nb
    f = 2.0 * prec * rec / jnp.maximum(prec + rec, 1e-12)
    return GeometryMetrics(chamfer, haus, f)


def compute_metrics_mesh(
    a: TriangleMesh, b: TriangleMesh, n_samples: int = 20000,
    fscore_radius: float = 0.01, key=None,
) -> GeometryMetrics:
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    return compute_metrics_point_cloud(
        a.sample_points_uniformly(n_samples, k1),
        b.sample_points_uniformly(n_samples, k2),
        fscore_radius,
    )
