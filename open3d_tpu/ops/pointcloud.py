"""Point-cloud ops: downsampling, normal estimation, outlier removal.

Reference: t/geometry/PointCloud.h:357-571 + kernels in
t/geometry/kernel/PointCloud{Impl.h,CPU.cpp,CUDA.cu}.

TPU design notes:
- VoxelDownSample: the reference inserts voxel coords into a device hashmap
  (PointCloud.cpp VoxelDownSample). Hash insertion is scatter-heavy; on TPU a
  lexicographic sort + segment-mean is faster, deterministic, and fully
  static-shape. Output keeps input capacity with an updated mask.
- EstimateNormals: neighbor gather (hybrid/knn via core.nns) + masked 3x3
  covariance + closed-form eigendecomposition (core.linalg.eigh3x3), all
  batched on the VPU; the reference uses per-point SVD3x3
  (core/linalg/kernel/SVD3x3.h).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from open3d_tpu.core import linalg, nns
from open3d_tpu.core.masking import FAR_COORD
from open3d_tpu.geometry.pointcloud import PointCloud


def voxel_down_sample(
    pcd: PointCloud, voxel_size: float, capacity: int | None = None
) -> PointCloud:
    """Average points (and attrs) per occupied voxel. Result rows
    0..n_voxels-1 are valid (ref: PointCloud::VoxelDownSample,
    PointCloud.h:357).

    capacity: optional SMALLER output capacity. The fixed-capacity idiom
    means downstream compute scales with the buffer, not the live count —
    a cloud downsampled from 307k rows to 30k points otherwise still pays
    307k-row NNS/ICP shapes. Valid rows are compacted to the front, so
    shrinking is a static slice; voxels beyond `capacity` are dropped
    (detect via count() == capacity)."""
    N = pcd.capacity
    pos = pcd.positions
    # Voxel integer coords; invalid rows land at huge coords and sort last.
    coords = jnp.floor(pos / voxel_size).astype(jnp.int32)
    coords = jnp.where(pcd.mask[:, None], coords, jnp.int32(2**30))
    order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    sc = coords[order]
    sorted_mask = pcd.mask[order]
    first = jnp.concatenate(
        [jnp.array([True]), jnp.any(sc[1:] != sc[:-1], axis=1)]
    ) & sorted_mask
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1  # -1 for leading invalids (none: first[0] True if any valid)
    seg_id = jnp.where(sorted_mask, seg_id, N - 1)  # park invalids in last segment slot
    n_seg = jnp.sum(first.astype(jnp.int32))

    def seg_mean(vals_sorted):
        w = sorted_mask.astype(jnp.float32)
        ww = w[:, None] if vals_sorted.ndim == 2 else w
        sums = jax.ops.segment_sum(vals_sorted * ww, seg_id, num_segments=N)
        cnts = jax.ops.segment_sum(w, seg_id, num_segments=N)
        c = cnts[:, None] if vals_sorted.ndim == 2 else cnts
        return sums / jnp.maximum(c, 1.0)

    new_mask = jnp.arange(N) < n_seg
    new_pos = seg_mean(pos[order])
    new_pos = jnp.where(new_mask[:, None], new_pos, FAR_COORD)
    new_attrs = {k: seg_mean(v[order]) for k, v in pcd.attrs.items()}
    if "normals" in new_attrs:
        nrm = new_attrs["normals"]
        new_attrs["normals"] = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    if capacity is not None and capacity < N:
        new_pos = new_pos[:capacity]
        new_mask = new_mask[:capacity]
        new_attrs = {k: v[:capacity] for k, v in new_attrs.items()}
    return PointCloud(positions=new_pos, mask=new_mask, attrs=new_attrs)


def random_down_sample(pcd: PointCloud, sampling_ratio: float, key) -> PointCloud:
    """Keep each valid point with prob `sampling_ratio`
    (ref: PointCloud::RandomDownSample, PointCloud.h:373)."""
    keep = jax.random.uniform(key, (pcd.capacity,)) < sampling_ratio
    return pcd.select_by_mask(keep)


def uniform_down_sample(pcd: PointCloud, every_k_points: int) -> PointCloud:
    """Keep every k-th valid point, by valid ordinal
    (ref: PointCloud::UniformDownSample, PointCloud.h:365)."""
    ordinal = jnp.cumsum(pcd.mask.astype(jnp.int32)) - 1
    return pcd.select_by_mask(ordinal % every_k_points == 0)


def farthest_point_down_sample(pcd: PointCloud, num_samples: int) -> PointCloud:
    """Iterative farthest-point sampling (ref: PointCloud::FarthestPointDownSample,
    PointCloud.h:382; CUDA impl ml/contrib/PointSampling.cuh). O(num_samples * N)
    distance updates, fully vectorized per round."""
    pos = pcd.valid_positions()
    N = pcd.capacity

    def body(carry, _):
        min_d2, selected, last_idx = carry
        d2 = jnp.sum((pos - pos[last_idx]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        cand = jnp.where(pcd.mask & ~selected, min_d2, -1.0)
        nxt = jnp.argmax(cand).astype(jnp.int32)
        selected = selected.at[nxt].set(True)
        return (min_d2, selected, nxt), None

    start = jnp.argmax(pcd.mask).astype(jnp.int32)
    selected0 = jnp.zeros((N,), bool).at[start].set(True)
    init = (jnp.full((N,), jnp.inf, jnp.float32), selected0, start)
    (_, selected, _), _ = jax.lax.scan(body, init, None, length=max(num_samples - 1, 0))
    return pcd.select_by_mask(selected)


def gather_neighbors(values: jnp.ndarray, idx: jnp.ndarray, fill=0.0):
    """Gather (N, k) neighbor rows from (M, ...) values; idx<0 -> fill."""
    safe = jnp.maximum(idx, 0)
    out = values[safe]
    m = (idx >= 0)
    m = m[..., None] if out.ndim == idx.ndim + 1 else m
    return jnp.where(m, out, fill)


def estimate_normals(
    pcd: PointCloud,
    max_nn: int = 30,
    radius: float | None = None,
    nns_grid_threshold: int | None = 65536,
    nns_max_per_cell: int = 64,
) -> PointCloud:
    """Per-point normals from the covariance of (radius-capped) k-NN
    neighborhoods (ref: PointCloud::EstimateNormals, PointCloud.h:522).

    nns_grid_threshold / nns_max_per_cell plumb the hybrid-search accuracy
    switch (grid_threshold=None forces the exact path; the grid path's
    per-cell cap can drop true neighbors in dense cells)."""
    pos = pcd.positions
    if radius is None:
        idx, _ = nns.knn_search(pos, pos, max_nn, target_mask=pcd.mask)
    else:
        idx, _, _ = nns.hybrid_search(
            pos, pos, radius, max_nn, target_mask=pcd.mask,
            grid_threshold=nns_grid_threshold, max_per_cell=nns_max_per_cell,
        )
    nbr = gather_neighbors(pos, idx)  # (N, k, 3)
    w = (idx >= 0).astype(jnp.float32)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nbr * w, axis=1) / cnt
    d = (nbr - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", d, d) / cnt[..., None]
    _, evecs = linalg.eigh3x3(cov)
    normals = evecs[..., 0]  # smallest-eigenvalue direction
    normals = jnp.where(pcd.mask[:, None], normals, 0.0)
    return pcd.with_attrs(normals=normals)


def estimate_covariances(
    pcd: PointCloud,
    max_nn: int = 30,
    radius: float | None = None,
) -> PointCloud:
    """Per-point neighborhood covariances as a (N, 3, 3) attr "covariances"
    (ref: PointCloud::EstimateCovariances, geometry/EstimateNormals.cpp —
    the GeneralizedICP input)."""
    pos = pcd.positions
    if radius is None:
        idx, _ = nns.knn_search(pos, pos, max_nn, target_mask=pcd.mask)
    else:
        idx, _, _ = nns.hybrid_search(pos, pos, radius, max_nn, target_mask=pcd.mask)
    nbr = gather_neighbors(pos, idx)
    w = (idx >= 0).astype(jnp.float32)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nbr * w, axis=1) / cnt
    d = (nbr - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", d, d) / cnt[..., None]
    return pcd.with_attrs(covariances=cov)


def orient_normals_to_align_with_direction(pcd: PointCloud, direction=(0.0, 0.0, 1.0)) -> PointCloud:
    """(ref: PointCloud::OrientNormalsToAlignWithDirection, PointCloud.h:529)"""
    d = jnp.asarray(direction, jnp.float32)
    n = pcd.attrs["normals"]
    flip = jnp.sum(n * d, axis=-1, keepdims=True) < 0
    return pcd.with_attrs(normals=jnp.where(flip, -n, n))


def orient_normals_towards_camera_location(pcd: PointCloud, camera=(0.0, 0.0, 0.0)) -> PointCloud:
    """(ref: PointCloud::OrientNormalsTowardsCameraLocation, PointCloud.h:537)"""
    cam = jnp.asarray(camera, jnp.float32)
    n = pcd.attrs["normals"]
    to_cam = cam - pcd.positions
    flip = jnp.sum(n * to_cam, axis=-1, keepdims=True) < 0
    return pcd.with_attrs(normals=jnp.where(flip, -n, n))


def estimate_color_gradients(
    pcd: PointCloud,
    max_nn: int = 30,
    radius: float | None = None,
) -> PointCloud:
    """Per-point tangent-plane color (intensity) gradient for colored ICP
    (ref: PointCloud::EstimateColorGradients, PointCloud.h:571; kernel
    EstimateColorGradientsUsingHybridSearch, t/geometry/kernel/PointCloudImpl.h).

    For each point i with normal n and intensity c_i, solves the 3x3
    least-squares system over neighbors j:
        g . d_j = c_j - c_i  where d_j = tangent-plane projection of (p_j - p_i)
    with the constraint g . n = 0 folded in as an extra row.
    """
    if "normals" not in pcd.attrs:
        raise ValueError("estimate_color_gradients requires normals")
    pos = pcd.positions
    nrm = pcd.attrs["normals"]
    colors = pcd.attrs["colors"]
    inten = jnp.mean(colors, axis=-1) if colors.ndim == 2 and colors.shape[-1] == 3 else colors.reshape(-1)

    if radius is None:
        idx, _ = nns.knn_search(pos, pos, max_nn, target_mask=pcd.mask)
    else:
        idx, _, _ = nns.hybrid_search(pos, pos, radius, max_nn, target_mask=pcd.mask)
    w = (idx >= 0).astype(jnp.float32)
    nbr_p = gather_neighbors(pos, idx)  # (N, k, 3)
    nbr_c = gather_neighbors(inten, idx)  # (N, k)

    d = nbr_p - pos[:, None, :]
    d = d - nrm[:, None, :] * jnp.sum(d * nrm[:, None, :], axis=-1, keepdims=True)
    dc = nbr_c - inten[:, None]
    dw = d * w[..., None]
    AtA = jnp.einsum("nki,nkj->nij", dw, d)
    Atb = jnp.einsum("nki,nk->ni", dw, dc)
    # constraint row n . g = 0 with the reference's unit weight-per-row scale
    AtA = AtA + jnp.einsum("ni,nj->nij", nrm, nrm)
    g = linalg.solve3x3(AtA + 1e-6 * jnp.eye(3, dtype=pos.dtype), Atb)
    g = jnp.where(pcd.mask[:, None], g, 0.0)
    return pcd.with_attrs(color_gradients=g)


def remove_statistical_outliers(pcd: PointCloud, nb_neighbors: int = 20, std_ratio: float = 2.0) -> PointCloud:
    """Drop points whose mean k-NN distance exceeds mean + std_ratio * std
    (ref: PointCloud::RemoveStatisticalOutliers, PointCloud.h:402)."""
    idx, d2 = nns.knn_search(pcd.positions, pcd.positions, nb_neighbors + 1, target_mask=pcd.mask)
    d = jnp.sqrt(jnp.maximum(d2[:, 1:], 0.0))  # skip self
    valid = idx[:, 1:] >= 0
    mean_d = jnp.sum(jnp.where(valid, d, 0.0), axis=1) / jnp.maximum(jnp.sum(valid, axis=1), 1)
    mu = jnp.sum(jnp.where(pcd.mask, mean_d, 0.0)) / jnp.maximum(jnp.sum(pcd.mask), 1)
    var = jnp.sum(jnp.where(pcd.mask, (mean_d - mu) ** 2, 0.0)) / jnp.maximum(jnp.sum(pcd.mask), 1)
    thresh = mu + std_ratio * jnp.sqrt(var)
    return pcd.select_by_mask(mean_d <= thresh)


def remove_radius_outliers(pcd: PointCloud, nb_points: int = 16, search_radius: float = 0.05) -> PointCloud:
    """Drop points with fewer than nb_points neighbors within search_radius
    (ref: PointCloud::RemoveRadiusOutliers, PointCloud.h:392)."""
    _, _, counts = nns.hybrid_search(
        pcd.positions, pcd.positions, search_radius, nb_points + 1, target_mask=pcd.mask
    )
    return pcd.select_by_mask(counts - 1 >= nb_points)  # exclude self


def compute_point_cloud_distance(source: PointCloud, target: PointCloud) -> jnp.ndarray:
    """Per-point distance to nearest target point, 0 for invalid rows
    (ref: legacy PointCloud::ComputePointCloudDistance)."""
    _, d2 = nns.one_nn_search(source.positions, target.positions, target_mask=target.mask)
    return jnp.where(source.mask, jnp.sqrt(jnp.maximum(d2, 0.0)), 0.0)


def orient_normals_consistent_tangent_plane(
    pcd: PointCloud,
    k: int = 10,
    max_sweeps: int | None = None,
) -> PointCloud:
    """Globally consistent normal orientation via tangent-plane propagation
    (ref: PointCloud::OrientNormalsConsistentTangentPlane, PointCloud.h:545;
    geometry/EstimateNormals.cpp — Hoppe '92 Riemannian-graph MST).

    TPU design: the reference traverses an explicit minimum spanning tree of
    the kNN graph weighted by 1 - |n_i . n_j| — a sequential DFS. Here the
    same seed (the +z-extremal point, normal forced upward) propagates as a
    vectorized WAVEFRONT over the same graph: every sweep, each unoriented
    point adopts the orientation of its most parallel already-oriented
    neighbor (a lax.while_loop with an on-device no-change predicate). On
    smooth surfaces the strongest-edge choice follows the same structure
    the MST picks; points the directed kNN graph never reaches keep their
    estimated sign.
    """
    if "normals" not in pcd.attrs:
        raise ValueError("orient_normals_consistent_tangent_plane requires normals")
    pos = pcd.positions
    n = pcd.attrs["normals"]
    N = pos.shape[0]
    idx, _ = nns.knn_search(pos, pos, k, target_mask=pcd.mask)  # (N, k)
    nbr_ok = (idx >= 0) & pcd.mask[:, None]
    safe_idx = jnp.maximum(idx, 0)
    dots = jnp.einsum("ni,nki->nk", n, n[safe_idx])  # n_i . n_j

    z = jnp.where(pcd.mask, pos[:, 2], -jnp.inf)
    seed = jnp.argmax(z)
    seed_sign = jnp.where(n[seed, 2] >= 0.0, 1.0, -1.0)
    sign0 = jnp.zeros((N,), jnp.float32).at[seed].set(seed_sign)

    if max_sweeps is None:
        # the kNN graph's diameter is Theta(N/k) on elongated clouds (a
        # corridor scan) — bound by N so the wavefront always spans it;
        # the while_loop stops at the first no-change sweep anyway
        max_sweeps = N

    def cond(state):
        sign, changed, it = state
        return changed & (it < max_sweeps)

    def body(state):
        sign, _, it = state
        nbr_sign = jnp.where(nbr_ok, sign[safe_idx], 0.0)  # (N, k)
        strength = jnp.where(nbr_sign != 0.0, jnp.abs(dots), -1.0)
        best = jnp.argmax(strength, axis=1)
        b = best[:, None]
        bs = jnp.take_along_axis(nbr_sign, b, axis=1)[:, 0]
        bd = jnp.take_along_axis(dots, b, axis=1)[:, 0]
        bw = jnp.take_along_axis(strength, b, axis=1)[:, 0]
        prop = jnp.where(bd >= 0, bs, -bs)
        fresh = (sign == 0.0) & (bw > 0.0) & pcd.mask
        new = jnp.where(fresh, prop, sign)
        return new, jnp.any(new != sign), it + 1

    sign, _, _ = jax.lax.while_loop(cond, body, (sign0, jnp.bool_(True), 0))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    return pcd.with_attrs(normals=n * sign[:, None])


def compute_boundary_points(
    pcd: PointCloud,
    radius: float,
    max_nn: int = 30,
    angle_threshold: float = 90.0,
) -> jnp.ndarray:
    """Boundary-point mask by the tangent-plane angular-gap criterion
    (ref: PointCloud::ComputeBoundaryPoints, PointCloud.h:502; kernel
    t/geometry/kernel/PointCloudImpl.h ComputeBoundaryPoints — a point is a
    boundary point if its neighbors leave an angular gap larger than
    `angle_threshold` degrees around it in its tangent plane).

    Returns a (N,) bool mask (False on invalid points). Requires normals.
    """
    if "normals" not in pcd.attrs:
        raise ValueError("compute_boundary_points requires normals")
    pos = pcd.positions
    nrm = pcd.attrs["normals"]
    idx, _, _ = nns.hybrid_search(pos, pos, radius, max_nn, target_mask=pcd.mask)
    ok = idx >= 0
    safe = jnp.maximum(idx, 0)
    d = pos[safe] - pos[:, None, :]  # (N, k, 3)
    # tangent basis (u, v) per point
    ref = jnp.where(
        (jnp.abs(nrm[:, 2:3]) < 0.9), jnp.asarray([0.0, 0.0, 1.0]),
        jnp.asarray([1.0, 0.0, 0.0]),
    )
    u = jnp.cross(nrm, jnp.broadcast_to(ref, nrm.shape))
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-9)
    v = jnp.cross(nrm, u)
    au = jnp.einsum("nki,ni->nk", d, u)
    av = jnp.einsum("nki,ni->nk", d, v)
    # self-match / invalid rows park at +inf so they sort to the tail
    ang = jnp.where(ok & (au**2 + av**2 > 1e-12), jnp.arctan2(av, au), jnp.inf)
    ang_s = jnp.sort(ang, axis=1)  # (N, k) valid angles first
    nv = jnp.sum(jnp.isfinite(ang_s), axis=1)  # valid angle count
    nxt = jnp.concatenate([ang_s[:, 1:], ang_s[:, :1]], axis=1)
    gap = jnp.where(jnp.isfinite(nxt) & jnp.isfinite(ang_s), nxt - ang_s, 0.0)
    # wrap-around gap: first valid + 2pi - last valid
    first = ang_s[:, 0]
    last = jnp.take_along_axis(
        ang_s, jnp.maximum(nv - 1, 0)[:, None], axis=1
    )[:, 0]
    wrap = jnp.where(nv >= 2, first + 2.0 * jnp.pi - last, 2.0 * jnp.pi)
    max_gap = jnp.maximum(jnp.max(gap, axis=1), wrap)
    thresh = jnp.deg2rad(angle_threshold)
    return pcd.mask & ((nv < 3) | (max_gap > thresh))


def extrude_linear(pcd: PointCloud, vector, scale: float = 1.0):
    """Sweep every point along `vector * scale`; returns a LineSet with one
    segment per point (ref: PointCloud::ExtrudeLinear, PointCloud.h:719)."""
    from open3d_tpu.geometry.lineset import LineSet

    v = jnp.asarray(vector, jnp.float32) * scale
    N = pcd.capacity
    p0 = pcd.positions
    p1 = jnp.where(pcd.mask[:, None], p0 + v, p0)
    pts = jnp.concatenate([p0, p1], axis=0)
    pmask = jnp.concatenate([pcd.mask, pcd.mask])
    lines = jnp.stack(
        [jnp.arange(N, dtype=jnp.int32), jnp.arange(N, dtype=jnp.int32) + N],
        axis=-1,
    )
    return LineSet.create(pts, lines, point_mask=pmask, line_mask=pcd.mask)


def extrude_rotation(
    pcd: PointCloud,
    angle_deg: float,
    axis,
    resolution: int = 16,
    translation: float = 0.0,
):
    """Sweep every point around `axis` (through the origin) by `angle_deg`,
    optionally translating along the axis (a helix); returns the swept
    polylines as a LineSet (ref: PointCloud::ExtrudeRotation,
    PointCloud.h:707)."""
    from open3d_tpu.core import lie
    from open3d_tpu.geometry.lineset import LineSet

    ax = jnp.asarray(axis, jnp.float32)
    ax = ax / jnp.maximum(jnp.linalg.norm(ax), 1e-12)
    N = pcd.capacity
    R = resolution
    ks = jnp.arange(R + 1, dtype=jnp.float32) / R
    angles = jnp.deg2rad(angle_deg) * ks
    # rotation about axis via exp of so(3); stack (R+1) copies
    rots = jax.vmap(lambda a: lie.so3_exp(ax * a))(angles)  # (R+1, 3, 3)
    offs = ks[:, None] * translation * ax[None, :]
    pts = (
        jnp.einsum("kij,nj->kni", rots, pcd.positions) + offs[:, None, :]
    ).reshape((R + 1) * N, 3)
    pmask = jnp.tile(pcd.mask, R + 1)
    seg = jnp.arange(N, dtype=jnp.int32)
    lines = jnp.concatenate(
        [
            jnp.stack([seg + k * N, seg + (k + 1) * N], axis=-1)
            for k in range(R)
        ],
        axis=0,
    )
    lmask = jnp.tile(pcd.mask, R)
    return LineSet.create(pts, lines, point_mask=pmask, line_mask=lmask)


def pca_partition(pcd: PointCloud, max_points: int):
    """Partition the cloud with recursive PCA splits until every partition
    holds <= max_points points (ref: PointCloud::PCAPartition,
    t/geometry/kernel/PCAPartition.cpp).

    TPU design: the reference splits the LARGEST partition first through a
    priority queue (sequential). Here EVERY oversize partition splits each
    round (mean/cov via segment sums, vmapped 3x3 eigh, split at the
    mid-extent along the principal axis — the same center rule), and ids
    re-compact densely after every round, so the loop runs until NO
    partition is oversize (mid-extent splits can be arbitrarily uneven on
    clustered data — a fixed log2 round count violated the invariant).
    Returns (num_partitions (), partition_ids (N,) int32, -1 invalid).
    """
    N = pcd.capacity
    pos = pcd.positions
    mask = pcd.mask
    w = mask.astype(jnp.float32)
    P = N  # dense ids stay < N after each round's compaction

    def compact(ids):
        big_id = jnp.int32(2**30)
        key = jnp.where(mask, ids, big_id)
        uniq = jnp.sort(key)
        first = jnp.concatenate([jnp.ones((1,), bool), uniq[1:] != uniq[:-1]])
        valid_first = first & (uniq < big_id)
        n_parts = jnp.sum(valid_first.astype(jnp.int32))
        roots = jnp.sort(jnp.where(valid_first, uniq, big_id))
        rank = jnp.searchsorted(roots, key).astype(jnp.int32)
        return jnp.where(mask, rank, 0), n_parts

    def round_body(state):
        ids, _, it = state
        cnt = jax.ops.segment_sum(w, ids, num_segments=P)
        sx = jax.ops.segment_sum(pos * w[:, None], ids, num_segments=P)
        mean = sx / jnp.maximum(cnt, 1.0)[:, None]
        d = (pos - mean[ids]) * w[:, None]
        sxx = jax.ops.segment_sum(
            jnp.einsum("ni,nj->nij", d, d), ids, num_segments=P
        )
        cov = sxx / jnp.maximum(cnt, 1.0)[:, None, None]
        _, evecs = jax.vmap(linalg.eigh3x3)(cov)
        ax = evecs[..., 2]  # largest-eigenvalue axis
        dot = jnp.sum((pos - mean[ids]) * ax[ids], axis=-1)
        big = jnp.float32(3e38)
        dmin = jax.ops.segment_min(
            jnp.where(mask, dot, big), ids, num_segments=P
        )
        dmax = jax.ops.segment_max(
            jnp.where(mask, dot, -big), ids, num_segments=P
        )
        center = 0.5 * (dmin + dmax)
        oversize = cnt > max_points
        split = oversize[ids] & mask
        # splitting partition i -> {2i, 2i+1} in a doubled id space, then
        # re-compacted to dense ids (so ids never exceed N)
        new_ids = jnp.where(
            split, 2 * ids + (dot >= center[ids]).astype(jnp.int32), 2 * ids
        )
        new_ids, n_parts = compact(new_ids)
        cnt2 = jax.ops.segment_sum(w, new_ids, num_segments=P)
        return new_ids, jnp.any(cnt2 > max_points), it + 1

    ids0, _ = compact(jnp.zeros((N,), jnp.int32))
    any_oversize0 = jnp.sum(w) > max_points
    ids, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < N),
        round_body,
        (ids0, any_oversize0, jnp.int32(0)),
    )
    out, n_parts = compact(ids)
    return n_parts, jnp.where(mask, out, -1)
