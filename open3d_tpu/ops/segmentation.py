"""Point-cloud segmentation / clustering / keypoints, TPU-native.

Reference surface (re-expressed, not ported):
- SegmentPlane      — t/geometry/PointCloud.h:470, geometry/PointCloudSegmentation.cpp
- ClusterDBSCAN     — t/geometry/PointCloud.h:454, geometry/PointCloudCluster.cpp
- ISS keypoints     — geometry/ISSKeypoints.cpp
- ComputeConvexHull — t/geometry/PointCloud.h:490 (Qhull in the reference)
- HiddenPointRemoval— t/geometry/PointCloud.h:439 (Katz spherical flip + hull)

TPU design notes: the reference's RANSAC loop is a serial early-exit OpenMP
loop (PointCloudSegmentation.cpp); here every hypothesis is drawn, fitted and
scored in one batched pass (vmap over hypotheses, MXU-tiled inlier count), and
the best plane is refined with a closed-form least-squares fit over inliers.
DBSCAN is a fixed-point min-label propagation over the radius-neighbor graph
(lax.while_loop with an on-device convergence predicate) instead of the
reference's serial BFS queue. Convex hull has no dense-compute structure that
maps to the MXU, so it stays on host via scipy (Qhull), matching the
reference's own use of Qhull as a host library.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.core import nns

_BIG = jnp.float32(3.0e38)
_INT_BIG = jnp.int32(2**30)


def _fit_plane_3pts(p0, p1, p2):
    """Plane (nx,ny,nz,d) through 3 points, unit normal; degenerate -> n=0."""
    n = jnp.cross(p1 - p0, p2 - p0)
    norm = jnp.linalg.norm(n)
    n = jnp.where(norm > 1e-12, n / jnp.maximum(norm, 1e-12), jnp.zeros(3))
    d = -jnp.dot(n, p0)
    return jnp.concatenate([n, d[None]])


def segment_plane(
    positions: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    distance_threshold: float = 0.01,
    ransac_n: int = 3,
    num_iterations: int = 100,
    probability: float = 0.999,
    seed: int = 0,
):
    """RANSAC plane segmentation (ref: PointCloud::SegmentPlane,
    geometry/PointCloudSegmentation.cpp:118-216).

    All `num_iterations` hypotheses are generated and scored in ONE batched
    device pass — no early exit; the confidence test the reference uses to
    stop early instead bounds `num_iterations` statically.

    Returns (plane_model (4,) f32, inlier_mask (N,) bool).
    """
    del ransac_n, probability  # 3-point hypotheses; iteration count is static
    n = positions.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    key = jax.random.PRNGKey(seed)
    # Sample valid indices: draw uniform, map through compacted valid ids.
    valid_ids = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), -1)
    order = jnp.argsort(valid_ids < 0, stable=True)  # valid first
    compact = valid_ids[order]
    n_valid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    draws = jax.random.randint(key, (num_iterations, 3), 0, 2**31 - 1)
    idx = compact[(draws % n_valid).astype(jnp.int32)]  # (I, 3) valid indices
    tri = positions[idx]  # (I, 3, 3)
    planes = jax.vmap(_fit_plane_3pts)(tri[:, 0], tri[:, 1], tri[:, 2])  # (I,4)

    # Score: inlier count per plane. (I, N) distances via one matmul.
    homog = jnp.concatenate([positions, jnp.ones((n, 1), positions.dtype)], -1)
    dist = jnp.abs(planes @ homog.T)  # (I, N)
    ok = (dist <= distance_threshold) & mask[None, :] & (
        jnp.linalg.norm(planes[:, :3], axis=-1, keepdims=True) > 0.5
    )
    counts = jnp.sum(ok, axis=1)
    best = jnp.argmax(counts)
    inliers = ok[best]

    # Least-squares refine on inliers (ref refits with GetPlaneFromPoints):
    # minimize |n.p + d| over inliers -> smallest eigenvector of covariance.
    w = inliers.astype(positions.dtype)[:, None]
    c = jnp.sum(positions * w, 0) / jnp.maximum(jnp.sum(w), 1.0)
    q = (positions - c) * w
    cov = q.T @ q
    _, vecs = jnp.linalg.eigh(cov)
    nrm = vecs[:, 0]
    plane = jnp.concatenate([nrm, -jnp.dot(nrm, c)[None]])
    # keep orientation consistent with the RANSAC winner
    flip = jnp.sign(jnp.dot(plane[:3], planes[best, :3]) + 1e-20)
    plane = plane * flip
    d2 = jnp.abs(homog @ plane)
    inliers = (d2 <= distance_threshold) & mask
    return plane, inliers


def cluster_dbscan(
    positions: jnp.ndarray,
    eps: float,
    min_points: int,
    mask: jnp.ndarray | None = None,
    max_neighbors: int = 64,
):
    """DBSCAN (ref: PointCloud::ClusterDBSCAN, geometry/PointCloudCluster.cpp).

    TPU formulation: radius-capped kNN graph once, then min-label propagation
    to a fixed point over core-core edges (lax.while_loop, on-device
    convergence flag) — equivalent to the reference's BFS region growing.
    Border points adopt the smallest core-neighbor label; noise = -1.
    Labels are compacted to 0..k-1 in ascending order of first occurrence
    position, matching the reference's deterministic ordering.
    """
    # the kNN graph is capped at max_neighbors: min_points beyond the cap
    # would make core detection impossible, so widen the cap to match (dense
    # clusters with > max_neighbors eps-neighbors may still split vs. the
    # reference's exact BFS; raise max_neighbors for exact parity there)
    max_neighbors = max(int(max_neighbors), int(min_points))
    n = positions.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    idx, _, cnt = nns.hybrid_search(
        positions, positions, radius=eps, max_knn=max_neighbors, target_mask=mask
    )
    cnt = jnp.where(mask, cnt, 0)
    core = cnt >= min_points  # self counts as its own neighbor (ref semantics)
    neigh_valid = idx >= 0
    safe_idx = jnp.maximum(idx, 0)
    neigh_core = core[safe_idx] & neigh_valid  # (N, k)

    labels0 = jnp.where(core, jnp.arange(n, dtype=jnp.int32), _INT_BIG)

    def body(state):
        labels, _ = state
        neigh_lbl = jnp.where(neigh_core, labels[safe_idx], _INT_BIG)
        new = jnp.minimum(labels, jnp.min(neigh_lbl, axis=1))
        new = jnp.where(core, new, labels)
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))

    # Border points: smallest label among core neighbors.
    neigh_lbl = jnp.where(neigh_core, labels[safe_idx], _INT_BIG)
    border_lbl = jnp.min(neigh_lbl, axis=1)
    labels = jnp.where(core, labels, border_lbl)
    labels = jnp.where(mask & (labels < _INT_BIG), labels, -1)

    # Compact to consecutive ids by first-occurrence order: the root of each
    # cluster is its minimum point index, so ranking roots by value matches
    # scan order.
    roots = jnp.unique(jnp.where(labels >= 0, labels, _INT_BIG), size=n, fill_value=_INT_BIG)
    rank = jnp.searchsorted(roots, jnp.maximum(labels, 0))
    labels = jnp.where(labels >= 0, rank.astype(jnp.int32), -1)
    return labels


def compute_iss_keypoints(
    positions: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    salient_radius: float = 0.0,
    non_max_radius: float = 0.0,
    gamma_21: float = 0.975,
    gamma_32: float = 0.975,
    min_neighbors: int = 5,
    max_neighbors: int = 64,
):
    """ISS keypoint mask (ref: geometry/ISSKeypoints.cpp ComputeISSKeypoints).

    Default radii (when 0) follow the reference: 6x / 4x mean point spacing
    is the caller's job there; here we require explicit radii or derive from
    the bounding box diagonal like the reference's `ComputeModelResolution`.
    Returns a bool (N,) keypoint mask.
    """
    n = positions.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if salient_radius <= 0.0 or non_max_radius <= 0.0:
        # model resolution = mean 1-NN distance (ISSKeypoints.cpp:138)
        _, d2 = nns.knn_search(positions, positions, k=2, target_mask=mask)
        res = jnp.sqrt(jnp.maximum(d2[:, 1], 0.0))
        res = jnp.sum(jnp.where(mask, res, 0.0)) / jnp.maximum(
            jnp.sum(mask.astype(jnp.float32)), 1.0
        )
        salient_radius = 6.0 * res
        non_max_radius = 4.0 * res

    idx, _, cnt = nns.hybrid_search(
        positions, positions, radius=salient_radius, max_knn=max_neighbors,
        target_mask=mask,
    )
    valid = idx >= 0
    safe = jnp.maximum(idx, 0)
    pts = positions[safe]  # (N, k, 3)
    w = valid.astype(positions.dtype)[..., None]
    nn = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mu = jnp.sum(pts * w, axis=1) / nn
    q = (pts - mu[:, None, :]) * w
    cov = jnp.einsum("nkd,nke->nde", q, q) / nn[..., None]
    evals = jnp.linalg.eigvalsh(cov)  # ascending: l3 <= l2 <= l1
    l3, l2, l1 = evals[:, 0], evals[:, 1], evals[:, 2]
    sal = (
        (l2 / jnp.maximum(l1, 1e-12) < gamma_21)
        & (l3 / jnp.maximum(l2, 1e-12) < gamma_32)
        & (cnt >= min_neighbors)
        & mask
    )
    # Non-max suppression on l3 within non_max_radius.
    nidx, _, _ = nns.hybrid_search(
        positions, positions, radius=non_max_radius, max_knn=max_neighbors,
        target_mask=mask,
    )
    self_ids = jnp.arange(n, dtype=jnp.int32)[:, None]
    nvalid = (nidx >= 0) & (nidx != self_ids)  # strict: exclude self
    nsafe = jnp.maximum(nidx, 0)
    neigh_l3 = jnp.where(nvalid, l3[nsafe], -_BIG)
    # reference NMS (ISSKeypoints.cpp IsLocalMaxima): strictly greater than
    # every neighbor's lambda3 — a flat region (all ties) yields no keypoints
    is_max = l3 > jnp.max(neigh_l3, axis=1)
    return sal & is_max


def compute_convex_hull(positions: np.ndarray, mask: np.ndarray | None = None):
    """Convex hull via Qhull on host (ref: t/geometry/PointCloud.h:490,
    utility/Qhull.cpp — the reference also calls Qhull as a host library).

    Returns (vertices (V,3) f32 np, triangles (T,3) i32 np, point_indices).
    """
    from scipy.spatial import ConvexHull

    pts = np.asarray(positions, np.float64)
    if mask is not None:
        keep = np.asarray(mask, bool)
        ids = np.nonzero(keep)[0]
        pts = pts[keep]
    else:
        ids = np.arange(len(pts))
    hull = ConvexHull(pts)
    verts = pts[hull.vertices].astype(np.float32)
    remap = np.full(len(pts), -1, np.int64)
    remap[hull.vertices] = np.arange(len(hull.vertices))
    tris = remap[hull.simplices].astype(np.int32)
    # orient triangles outward (Qhull equations give outward normals)
    c = pts.mean(0)
    for t in range(len(tris)):
        a, b, d = verts[tris[t]]
        if np.dot(np.cross(b - a, d - a), a - c) < 0:
            tris[t] = tris[t][[0, 2, 1]]
    return verts, tris, ids[hull.vertices].astype(np.int32)


def hidden_point_removal(
    positions: np.ndarray,
    camera_location,
    radius: float,
    mask: np.ndarray | None = None,
):
    """Katz et al. hidden-point removal (ref: t/geometry/PointCloud.h:439,
    geometry/PointCloud.cpp HiddenPointRemoval): spherical flip about the
    camera then convex hull; points on the hull are visible.

    Returns visible index array (np int32). Host-side (hull is host math).
    """
    from scipy.spatial import ConvexHull

    pts = np.asarray(positions, np.float64)
    if mask is not None:
        ids = np.nonzero(np.asarray(mask, bool))[0]
        pts = pts[ids]
    else:
        ids = np.arange(len(pts))
    cam = np.asarray(camera_location, np.float64).reshape(1, 3)
    p = pts - cam
    norm = np.linalg.norm(p, axis=1, keepdims=True)
    norm = np.maximum(norm, 1e-12)
    flipped = p + 2.0 * (radius - norm) * (p / norm)
    aug = np.vstack([flipped, np.zeros((1, 3))])  # camera at origin
    hull = ConvexHull(aug)
    vis = hull.vertices[hull.vertices < len(pts)]
    return ids[np.sort(vis)].astype(np.int32)


def detect_planar_patches(
    pcd,
    normal_variance_threshold_deg: float = 60.0,
    coplanarity_deg: float = 75.0,
    distance_threshold: float = 0.02,
    min_num_points: int = 30,
    knn: int = 16,
    max_patches: int = 32,
):
    """Planar patch detection (ref: PointCloud::DetectPlanarPatches,
    PointCloud.h + geometry/PointCloudPlanarPatchDetection.cpp — Araujo &
    Oliveira 2020 robust planar patches).

    TPU design: the reference grows patches through an octree split/merge
    hierarchy with robust plane statistics — recursive and data-dependent.
    Here patches form by MIN-LABEL PROPAGATION over the kNN graph restricted
    to planar-compatible edges (the same fixed-point machinery as
    cluster_dbscan): an edge i-j survives iff the normals agree within
    `normal_variance_threshold_deg` AND each point lies within
    `distance_threshold` of the other's tangent plane (the coplanarity
    test). Components with >= min_num_points become patches; each returns
    an oriented bounding box in its plane frame (normal + in-plane PCA
    axes), like the reference's OBB output.

    Returns (labels (N,) int32 with -1 = unassigned, obbs:
    OrientedBoundingBox batched over the leading axis (max_patches,...),
    n_patches int32). Requires normals.
    """
    from open3d_tpu.core import linalg as _linalg
    from open3d_tpu.geometry.bounding_volume import OrientedBoundingBox

    if "normals" not in pcd.attrs:
        raise ValueError("detect_planar_patches requires normals")
    pos = pcd.positions
    nrm = pcd.attrs["normals"]
    n = pos.shape[0]
    mask = pcd.mask

    idx, _ = nns.knn_search(pos, pos, knn, target_mask=mask)
    ok = (idx >= 0) & mask[:, None]
    safe = jnp.maximum(idx, 0)
    nj = nrm[safe]  # (N, k, 3)
    pj = pos[safe]
    cos_n = jnp.cos(jnp.deg2rad(normal_variance_threshold_deg))
    ndot = jnp.abs(jnp.einsum("ni,nki->nk", nrm, nj))
    dvec = pj - pos[:, None, :]
    dlen = jnp.linalg.norm(dvec, axis=-1)
    d_ij = jnp.abs(jnp.einsum("ni,nki->nk", nrm, dvec))
    d_ji = jnp.abs(jnp.einsum("nki,nki->nk", nj, -dvec))
    # coplanarity (ref: the planarity angle test in
    # PointCloudPlanarPatchDetection.cpp): the displacement must lie within
    # `coplanarity_deg` of each endpoint's tangent plane, i.e.
    # |n . d| <= |d| * cos(coplanarity_deg); plus the absolute
    # plane-distance gate
    cos_c = jnp.cos(jnp.deg2rad(coplanarity_deg))
    edge = (
        ok & (ndot > cos_n)
        & (d_ij < distance_threshold) & (d_ji < distance_threshold)
        & (d_ij <= dlen * cos_c) & (d_ji <= dlen * cos_c)
    )

    labels0 = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), _INT_BIG)

    def body(state):
        labels, _ = state
        neigh = jnp.where(edge, labels[safe], _INT_BIG)
        new = jnp.minimum(labels, jnp.min(neigh, axis=1))
        new = jnp.where(mask, new, _INT_BIG)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], body, (labels0, jnp.bool_(True))
    )

    # component sizes -> keep the max_patches biggest with >= min_num_points
    sizes = jnp.zeros((n,), jnp.int32).at[jnp.minimum(labels, n - 1)].add(
        jnp.where(mask, 1, 0)
    )
    root_size = jnp.where(mask, sizes[jnp.minimum(labels, n - 1)], 0)
    is_root = mask & (labels == jnp.arange(n))
    root_order = jnp.argsort(jnp.where(is_root, -sizes, 1))[:max_patches]
    picked = sizes[root_order] >= min_num_points
    n_patches = jnp.sum(picked.astype(jnp.int32))

    # per-patch plane frame + OBB (vectorized over max_patches)
    def patch_obb(root, valid):
        sel = mask & (labels == root) & valid
        w = sel.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(w), 1.0)
        c = jnp.sum(pos * w[:, None], axis=0) / cnt
        nmean = jnp.sum(nrm * w[:, None], axis=0)
        nhat = nmean / jnp.maximum(jnp.linalg.norm(nmean), 1e-9)
        d = (pos - c) * w[:, None]
        # in-plane covariance -> principal tangent axes
        dt = d - jnp.sum(d * nhat, axis=-1, keepdims=True) * nhat
        cov = dt.T @ dt / cnt
        _, evecs = _linalg.eigh3x3(cov)
        u = evecs[:, 2]
        u = u - jnp.dot(u, nhat) * nhat
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-9)
        v = jnp.cross(nhat, u)
        R = jnp.stack([u, v, nhat], axis=1)  # columns = axes
        proj = d @ R  # (N, 3) coords in the plane frame
        lo = jnp.min(jnp.where(sel[:, None], proj, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(sel[:, None], proj, -jnp.inf), axis=0)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
        ext = jnp.maximum(hi - lo, 1e-6)
        center = c + R @ ((lo + hi) * 0.5)
        return center, R, ext

    centers, Rs, exts = jax.vmap(patch_obb)(
        labels[root_order], picked
    )
    obbs = OrientedBoundingBox(center=centers, rotation=Rs, extent=exts)

    # compact labels: -1 for unassigned/small patches
    rank = jnp.full((n + 1,), -1, jnp.int32)
    rank = rank.at[jnp.where(picked, root_order, n)].set(
        jnp.arange(max_patches, dtype=jnp.int32), mode="drop"
    )
    out_labels = jnp.where(
        mask & (root_size >= min_num_points),
        rank[jnp.minimum(labels, n)],
        -1,
    )
    return out_labels, obbs, n_patches
