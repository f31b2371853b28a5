"""VoxelGrid + linear Octree, TPU-native.

Reference:
- VoxelGrid — geometry/VoxelGrid.h:61, VoxelGridFactory.cpp
  (CreateFromPointCloud / CreateDense, carving, CheckIfIncluded)
- Octree    — geometry/Octree.h:244 (pointer-based, host recursion)

TPU re-design: the pointer-chasing octree becomes a LINEAR octree — points
are assigned Morton codes (bit-interleaved quantized coords); every octree
level is the sorted unique prefix set of those codes. Construction is one
sort + per-level unique (all static-shape, device-resident); `locate` is a
searchsorted. This is the standard GPU/TPU octree formulation (Karras-style)
and replaces Octree.h's recursive Insert/Traverse.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

_INT_BIG = jnp.int32(2**30)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class VoxelGrid:
    """Dense-key sparse voxel set (ref: geometry/VoxelGrid.h:61).

    `coords` (V, 3) int32 voxel indices (rows beyond `num_voxels` = _INT_BIG),
    `colors` (V, 3) f32 mean color per voxel; origin/voxel_size static floats.
    """

    coords: jnp.ndarray
    colors: jnp.ndarray
    num_voxels: jnp.ndarray
    origin: jnp.ndarray
    voxel_size: float = field(metadata=dict(static=True))

    @property
    def valid(self) -> jnp.ndarray:
        return self.coords[:, 0] < _INT_BIG

    def get_voxel_centers(self) -> jnp.ndarray:
        return (self.coords.astype(jnp.float32) + 0.5) * self.voxel_size + self.origin

    def check_if_included(self, queries: jnp.ndarray) -> jnp.ndarray:
        """(ref: VoxelGrid::CheckIfIncluded) bool per query point."""
        q = jnp.floor((queries - self.origin) / self.voxel_size).astype(jnp.int32)
        return _rows_in_sorted(self.coords, q)


def _row_key(coords: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic float key for (N,3) int rows (int32-safe: 20 bits/axis
    would overflow; use float64-free pairing via two-level sort instead)."""
    # stable two-pass: sort by z, then y, then x keeps rows lexicographic
    return coords


def _sort_rows(coords: jnp.ndarray):
    order = jnp.arange(coords.shape[0])
    for axis in (2, 1, 0):
        perm = jnp.argsort(coords[order, axis], stable=True)
        order = order[perm]
    return order


def _rows_in_sorted(table: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Membership of query rows in table rows (both (., 3) int32). Table rows
    must be unique; invalid rows parked at _INT_BIG never match."""
    # compare via searchsorted on a packed 48-bit float is lossy; instead use
    # three chained searchsorted on the lexicographically sorted table.
    order = _sort_rows(table)
    t = table[order]

    def leq(a, b):  # lexicographic a <= b per row
        ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
        bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
        return (ax < bx) | ((ax == bx) & ((ay < by) | ((ay == by) & (az <= bz))))

    # binary search per query (vectorized): find any equal row
    n = t.shape[0]

    def locate(q):
        lo, hi = jnp.int32(0), jnp.int32(n)

        def body(state):
            lo, hi = state
            mid = (lo + hi) // 2
            go_right = ~leq(q, t[mid])
            return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

        def cond(state):
            return state[0] < state[1]

        lo, _ = jax.lax.while_loop(cond, body, (lo, hi))
        lo = jnp.minimum(lo, n - 1)
        return jnp.all(t[lo] == q)

    return jax.lax.map(locate, queries, batch_size=1024)


def create_from_point_cloud(
    points: jnp.ndarray,
    voxel_size: float,
    colors: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    max_voxels: int | None = None,
    origin=None,
) -> VoxelGrid:
    """(ref: VoxelGridFactory.cpp CreateFromPointCloud): one voxel per
    occupied cell, color = mean of points inside."""
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if max_voxels is None:
        max_voxels = n
    if origin is None:
        origin = jnp.where(mask[:, None], points, jnp.inf).min(0)
    origin = jnp.asarray(origin, jnp.float32)
    c = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    c = jnp.where(mask[:, None], c, _INT_BIG)
    uniq, inv = jnp.unique(
        c, axis=0, size=max_voxels, fill_value=_INT_BIG, return_inverse=True
    )
    inv = inv.reshape(-1).astype(jnp.int32)
    nvox = jnp.sum(uniq[:, 0] < _INT_BIG)
    if colors is None:
        colors = jnp.zeros((n, 3), jnp.float32)
    w = mask.astype(jnp.float32)
    csum = jax.ops.segment_sum(colors * w[:, None], inv, num_segments=max_voxels)
    cnt = jax.ops.segment_sum(w, inv, num_segments=max_voxels)
    col = csum / jnp.maximum(cnt, 1.0)[:, None]
    return VoxelGrid(uniq, col, nvox, origin, float(voxel_size))


def create_dense(origin, color, voxel_size: float, width: float, height: float,
                 depth: float) -> VoxelGrid:
    """(ref: VoxelGrid::CreateDense)"""
    nx = max(int(round(width / voxel_size)), 1)
    ny = max(int(round(height / voxel_size)), 1)
    nz = max(int(round(depth / voxel_size)), 1)
    g = jnp.stack(
        jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), jnp.arange(nz), indexing="ij"),
        -1,
    ).reshape(-1, 3).astype(jnp.int32)
    col = jnp.broadcast_to(jnp.asarray(color, jnp.float32), (g.shape[0], 3))
    return VoxelGrid(
        g, col, jnp.int32(g.shape[0]), jnp.asarray(origin, jnp.float32),
        float(voxel_size),
    )


def carve_depth_map(
    grid: VoxelGrid, depth: jnp.ndarray, intrinsic, extrinsic,
    keep_voxels_outside_image: bool = True,
) -> VoxelGrid:
    """Silhouette/depth carving (ref: VoxelGrid::CarveDepthMap): remove voxels
    that project in front of the observed depth (i.e. provably empty space)."""
    K = intrinsic.intrinsic_matrix
    E = jnp.asarray(extrinsic, jnp.float32)
    centers = grid.get_voxel_centers()
    pc = centers @ E[:3, :3].T + E[:3, 3]
    z = pc[:, 2]
    u = pc[:, 0] / jnp.maximum(z, 1e-6) * K[0, 0] + K[0, 2]
    v = pc[:, 1] / jnp.maximum(z, 1e-6) * K[1, 1] + K[1, 2]
    h, w = depth.shape
    ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
    inside = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 0)
    d = depth[vi, ui]
    carved = inside & (d > 0) & (z < d)  # voxel strictly in front of surface
    if not keep_voxels_outside_image:
        carved = carved | ~inside
    keep = grid.valid & ~carved
    coords = jnp.where(keep[:, None], grid.coords, _INT_BIG)
    return VoxelGrid(coords, grid.colors, jnp.sum(keep), grid.origin, grid.voxel_size)


# ------------------------------------------------------------------ octree --
def morton_encode(coords: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """Interleave (N,3) int coords in [0, 2^bits) -> (N,) int32 Morton codes."""
    c = jnp.clip(coords, 0, (1 << bits) - 1).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    code = spread(c[..., 0]) | (spread(c[..., 1]) << 1) | (spread(c[..., 2]) << 2)
    return code.astype(jnp.int32)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Octree:
    """Linear octree (ref class: geometry/Octree.h:244; TPU re-design).

    level_codes[d]: sorted unique Morton prefixes (codes >> 3*(depth-d)) of
    occupied nodes at depth d, padded with _INT_BIG. Leaf point membership is
    recovered by searchsorted over the full-depth codes of the sorted points.
    """

    point_codes: jnp.ndarray  # (N,) sorted full-depth codes of input points
    point_order: jnp.ndarray  # (N,) permutation into the original cloud
    level_codes: tuple  # tuple over depth of (Mi,) int32 sorted unique codes
    level_counts: tuple  # occupied node count per level
    origin: jnp.ndarray
    size: float = field(metadata=dict(static=True))
    max_depth: int = field(metadata=dict(static=True))

    def locate_leaf(self, points: jnp.ndarray) -> jnp.ndarray:
        """Leaf node index at max_depth for each query (-1 if empty)."""
        q = jnp.floor(
            (points - self.origin) / self.size * (1 << self.max_depth)
        ).astype(jnp.int32)
        code = morton_encode(q, self.max_depth)
        table = self.level_codes[-1]
        pos = jnp.clip(jnp.searchsorted(table, code), 0, table.shape[0] - 1)
        return jnp.where(table[pos] == code, pos.astype(jnp.int32), -1)


def octree_from_point_cloud(
    points: jnp.ndarray,
    max_depth: int = 6,
    mask: jnp.ndarray | None = None,
    size_expand: float = 0.01,
) -> Octree:
    """Build a linear octree (ref: Octree::ConvertFromPointCloud,
    geometry/Octree.cpp): cube root cell = expanded AABB, one sort, per-level
    unique prefixes."""
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    lo = jnp.where(mask[:, None], points, jnp.inf).min(0)
    hi = jnp.where(mask[:, None], points, -jnp.inf).max(0)
    size = float(jnp.max(hi - lo) * (1.0 + size_expand))
    res = 1 << max_depth
    q = jnp.floor((points - lo) / size * res).astype(jnp.int32)
    q = jnp.clip(q, 0, res - 1)
    codes = jnp.where(mask, morton_encode(q, max_depth), _INT_BIG)
    order = jnp.argsort(codes)
    scodes = codes[order]
    levels = []
    counts = []
    for d in range(1, max_depth + 1):
        shift = 3 * (max_depth - d)
        pref = jnp.where(scodes < _INT_BIG, scodes >> shift, _INT_BIG)
        uniq = jnp.unique(pref, size=n, fill_value=_INT_BIG)
        levels.append(uniq)
        counts.append(jnp.sum(uniq < _INT_BIG))
    return Octree(
        scodes, order.astype(jnp.int32), tuple(levels), tuple(counts),
        lo, size, max_depth,
    )
