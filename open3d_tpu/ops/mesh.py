"""Triangle-mesh toolbox ops, TPU-native.

Reference surface (SURVEY.md §2.2 / §2.5):
- SubdivideMidpoint         — geometry/TriangleMeshSubdivide.cpp
- SimplifyVertexClustering  — geometry/TriangleMeshSimplification.cpp
- ClipPlane                 — t/geometry/TriangleMesh.h (ClipPlane)
- RemoveDuplicated/Degenerate — TriangleMesh cleanup family
- FilterSmoothLaplacian/Taubin — geometry/TriangleMesh.cpp filters

All ops keep the fixed-capacity mask idiom: outputs allocate static shapes
(4T for one subdivision level, V for clustering) with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open3d_tpu.geometry.trianglemesh import TriangleMesh

_INT_BIG = jnp.int32(2**30)


def subdivide_midpoint(mesh: TriangleMesh, number_of_iterations: int = 1) -> TriangleMesh:
    """Midpoint (1:4) subdivision (ref: TriangleMesh::SubdivideMidpoint,
    geometry/TriangleMeshSubdivide.cpp). Edge midpoints are deduplicated by
    sorted-edge keys so the result stays watertight where the input was."""
    for _ in range(number_of_iterations):
        v = mesh.vertices
        t = jnp.maximum(mesh.triangles, 0)
        V = v.shape[0]
        T = t.shape[0]
        # unique edges via sorted pairs
        e = jnp.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], 0)  # (3T,2)
        e = jnp.sort(e, axis=1)
        # row-wise unique via one lexicographic lax.sort (no packed scalar
        # key, so V > 46340 cannot overflow int32)
        n3 = e.shape[0]
        s0, s1, perm = jax.lax.sort(
            (e[:, 0], e[:, 1], jnp.arange(n3, dtype=jnp.int32)), num_keys=2
        )
        first = jnp.concatenate(
            [jnp.array([True]), (s0[1:] != s0[:-1]) | (s1[1:] != s1[:-1])]
        )
        gid = jnp.cumsum(first.astype(jnp.int32)) - 1  # group id per sorted row
        inv = jnp.zeros((n3,), jnp.int32).at[perm].set(gid)
        mid_a = jnp.zeros((n3,), jnp.int32).at[gid].set(s0)
        mid_b = jnp.zeros((n3,), jnp.int32).at[gid].set(s1)
        mids = 0.5 * (v[jnp.clip(mid_a, 0, V - 1)] + v[jnp.clip(mid_b, 0, V - 1)])
        new_v = jnp.concatenate([v, mids], 0)  # (V + 3T, 3)
        m01 = V + inv[:T]
        m12 = V + inv[T:2 * T]
        m20 = V + inv[2 * T:]
        t0, t1, t2 = t[:, 0], t[:, 1], t[:, 2]
        new_t = jnp.concatenate(
            [
                jnp.stack([t0, m01, m20], -1),
                jnp.stack([m01, t1, m12], -1),
                jnp.stack([m20, m12, t2], -1),
                jnp.stack([m01, m12, m20], -1),
            ],
            0,
        ).astype(jnp.int32)
        vmask = jnp.concatenate(
            [mesh.vertex_mask, jnp.arange(n3) < jnp.sum(first.astype(jnp.int32))]
        )
        tmask = jnp.tile(mesh.triangle_mask, 4)
        mesh = TriangleMesh.create(new_v, new_t, vertex_mask=vmask, triangle_mask=tmask)
    return mesh


def simplify_vertex_clustering(mesh: TriangleMesh, voxel_size: float) -> TriangleMesh:
    """Vertex-clustering simplification (ref:
    TriangleMesh::SimplifyVertexClustering,
    geometry/TriangleMeshSimplification.cpp): vertices snapping to the same
    voxel merge to their mean; degenerate triangles are masked out."""
    v = mesh.vertices
    V = v.shape[0]
    c = jnp.floor(v / voxel_size).astype(jnp.int32)
    c = jnp.where(mesh.vertex_mask[:, None], c, _INT_BIG)
    uniq, inv = jnp.unique(c, axis=0, size=V, fill_value=_INT_BIG, return_inverse=True)
    inv = inv.reshape(-1).astype(jnp.int32)
    w = mesh.vertex_mask.astype(jnp.float32)
    vsum = jax.ops.segment_sum(v * w[:, None], inv, num_segments=V)
    cnt = jax.ops.segment_sum(w, inv, num_segments=V)
    new_v = vsum / jnp.maximum(cnt, 1.0)[:, None]
    new_t = inv[jnp.maximum(mesh.triangles, 0)]
    degen = (
        (new_t[:, 0] == new_t[:, 1])
        | (new_t[:, 1] == new_t[:, 2])
        | (new_t[:, 0] == new_t[:, 2])
    )
    tmask = mesh.triangle_mask & ~degen
    vmask = uniq[:, 0] < _INT_BIG
    return TriangleMesh.create(new_v, new_t, vertex_mask=vmask, triangle_mask=tmask)


def clip_plane(mesh: TriangleMesh, point, normal) -> TriangleMesh:
    """Keep the half-space n.(x-p) >= 0 (ref: t::TriangleMesh::ClipPlane).
    Triangles crossing the plane are masked out (conservative clip; the
    reference re-triangulates the crossing band)."""
    p = jnp.asarray(point, jnp.float32)
    n = jnp.asarray(normal, jnp.float32)
    keep_v = (mesh.vertices - p) @ n >= 0
    t = jnp.maximum(mesh.triangles, 0)
    keep_t = keep_v[t[:, 0]] & keep_v[t[:, 1]] & keep_v[t[:, 2]]
    return TriangleMesh.create(
        mesh.vertices, mesh.triangles,
        vertex_mask=mesh.vertex_mask & keep_v,
        triangle_mask=mesh.triangle_mask & keep_t,
        vertex_attrs=mesh.vertex_attrs, triangle_attrs=mesh.triangle_attrs,
    )


def remove_duplicated_vertices(mesh: TriangleMesh, decimals: int = 6) -> TriangleMesh:
    """Merge bit-identical (rounded) vertices (ref:
    TriangleMesh::RemoveDuplicatedVertices)."""
    v = mesh.vertices
    V = v.shape[0]
    q = jnp.round(v * (10.0**decimals)).astype(jnp.int32)
    q = jnp.where(mesh.vertex_mask[:, None], q, _INT_BIG)
    uniq, inv = jnp.unique(q, axis=0, size=V, fill_value=_INT_BIG, return_inverse=True)
    inv = inv.reshape(-1).astype(jnp.int32)
    # representative = first occurrence (deterministic via segment_min)
    first = jax.ops.segment_min(
        jnp.arange(V, dtype=jnp.int32), inv, num_segments=V
    )
    new_v = v[jnp.clip(first, 0, V - 1)]
    new_t = inv[jnp.maximum(mesh.triangles, 0)]
    return TriangleMesh.create(
        new_v, new_t,
        vertex_mask=uniq[:, 0] < _INT_BIG, triangle_mask=mesh.triangle_mask,
    )


def filter_smooth_laplacian(
    mesh: TriangleMesh, number_of_iterations: int = 1, lambda_filter: float = 0.5,
    max_degree: int = 16,
) -> TriangleMesh:
    """Laplacian smoothing (ref: TriangleMesh::FilterSmoothLaplacian,
    geometry/TriangleMesh.cpp): v += lambda * (mean(neighbors) - v), neighbor
    set from triangle adjacency (segment-mean, static capacity)."""
    t = jnp.maximum(mesh.triangles, 0)
    V = mesh.vertices.shape[0]
    tw = mesh.triangle_mask.astype(jnp.float32)
    src = jnp.concatenate([t[:, 0], t[:, 1], t[:, 2], t[:, 1], t[:, 2], t[:, 0]])
    dst = jnp.concatenate([t[:, 1], t[:, 2], t[:, 0], t[:, 0], t[:, 1], t[:, 2]])
    ew = jnp.tile(tw, 6)
    v = mesh.vertices
    for _ in range(number_of_iterations):
        s = jax.ops.segment_sum(v[dst] * ew[:, None], src, num_segments=V)
        c = jax.ops.segment_sum(ew, src, num_segments=V)
        mean = s / jnp.maximum(c, 1.0)[:, None]
        upd = v + lambda_filter * (mean - v)
        v = jnp.where((c > 0)[:, None] & mesh.vertex_mask[:, None], upd, v)
    return TriangleMesh.create(
        v, mesh.triangles, vertex_mask=mesh.vertex_mask,
        triangle_mask=mesh.triangle_mask, vertex_attrs=mesh.vertex_attrs,
        triangle_attrs=mesh.triangle_attrs,
    )


def filter_smooth_taubin(
    mesh: TriangleMesh, number_of_iterations: int = 1,
    lambda_filter: float = 0.5, mu: float = -0.53,
) -> TriangleMesh:
    """Taubin λ|μ smoothing (ref: TriangleMesh::FilterSmoothTaubin):
    shrink-free alternation of positive and negative Laplacian steps."""
    for _ in range(number_of_iterations):
        mesh = filter_smooth_laplacian(mesh, 1, lambda_filter)
        mesh = filter_smooth_laplacian(mesh, 1, mu)
    return mesh
