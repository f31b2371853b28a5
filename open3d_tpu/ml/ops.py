"""3D ML ops, TPU-native (ref: cpp/open3d/ml/{impl,contrib}/, SURVEY.md §2.10).

Reference components re-expressed:
- voxelize / voxel_pooling   — ml/impl/misc/Voxelize.h, VoxelPooling.h
- ball_query                 — ml/contrib/BallQuery.cu
- knn / fixed_radius_search  — shares core/nns (ml/impl/misc/FixedRadiusSearch.h)
- three_nn / three_interpolate — ml/contrib/InterpolatePoints.cu
- farthest point sampling    — ml/contrib/PointSampling.cuh
- nms / iou_bev / iou_3d     — ml/contrib/Nms.cu, IoU.cu (BEV rotated boxes)
- reduce_subarrays_sum       — ml/impl/misc/ReduceSubarraysSum.h
- invert_neighbors_list      — ml/impl/misc/InvertNeighborsList.h
- ragged_to_dense            — ml/impl/misc/RaggedToDense.h
- continuous_conv            — ml/impl/continuous_conv/ContinuousConv.h (Fluids'20)
- sparse_conv                — ml/impl/sparse_conv/SparseConv.h

All ragged structures use the reference's CSR convention (values +
row_splits), with fixed caps where a static shape is required; gradients flow
through every op that is differentiable in the reference (cconv, sparse conv,
interpolation) for free via jax autodiff, replacing the hand-written backward
kernels (ml/impl/continuous_conv/ContinuousConvBackpropFilter.h etc.).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open3d_tpu.core import nns
from open3d_tpu.ops.pointcloud import farthest_point_down_sample  # noqa: F401

_BIG = jnp.float32(3.0e38)


# ---------------------------------------------------------------- voxelize --
def voxelize(
    points: jnp.ndarray,
    voxel_size,
    points_range_min,
    points_range_max,
    max_points_per_voxel: int = 64,
    max_voxels: int = 4096,
):
    """Group points into occupied voxels (ref: ml/impl/misc/Voxelize.h
    VoxelizeCPU). Returns (voxel_coords (V,3) i32, voxel_point_indices
    (V, max_points) i32 padded with -1, voxel_point_counts (V,), num_voxels)
    with V = max_voxels; rows beyond num_voxels have coords = -1.
    """
    points = jnp.asarray(points, jnp.float32)
    vs = jnp.broadcast_to(jnp.asarray(voxel_size, jnp.float32), (3,))
    lo = jnp.asarray(points_range_min, jnp.float32)
    hi = jnp.asarray(points_range_max, jnp.float32)
    inside = jnp.all((points >= lo) & (points <= hi), axis=-1)
    coords = jnp.floor((points - lo) / vs).astype(jnp.int32)
    dims = jnp.maximum(jnp.ceil((hi - lo) / vs).astype(jnp.int32), 1)
    coords = jnp.clip(coords, 0, dims - 1)
    lin = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    lin = jnp.where(inside, lin, jnp.int32(2**31 - 1))

    # sort points by voxel id; segment boundaries give voxel rows
    order = jnp.argsort(lin)
    slin = lin[order]
    n = points.shape[0]
    is_first = jnp.concatenate([jnp.array([True]), slin[1:] != slin[:-1]])
    is_first &= slin < 2**31 - 1
    voxel_rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # per sorted point
    voxel_rank = jnp.where(slin < 2**31 - 1, voxel_rank, max_voxels)
    num_voxels = jnp.minimum(jnp.max(jnp.where(is_first, voxel_rank + 1, 0)), max_voxels)

    # rank of point within its voxel
    first_pos = jnp.where(is_first, jnp.arange(n), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, first_pos)
    within = jnp.arange(n) - seg_start

    vox_ok = (voxel_rank < max_voxels) & (within < max_points_per_voxel)
    flat = jnp.where(vox_ok, voxel_rank * max_points_per_voxel + within, max_voxels * max_points_per_voxel)
    vpi = jnp.full((max_voxels * max_points_per_voxel + 1,), -1, jnp.int32)
    vpi = vpi.at[flat].set(order.astype(jnp.int32), mode="drop")
    vpi = vpi[:-1].reshape(max_voxels, max_points_per_voxel)

    counts_sorted = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), jnp.minimum(voxel_rank, max_voxels),
        num_segments=max_voxels + 1,
    )[:max_voxels]
    vcoords = jnp.full((max_voxels, 3), -1, jnp.int32)
    rows = jnp.where(is_first & (voxel_rank < max_voxels), voxel_rank, max_voxels)
    vcoords = (
        jnp.concatenate([vcoords, jnp.full((1, 3), -1, jnp.int32)], 0)
        .at[rows].set(coords[order], mode="drop")[:max_voxels]
    )
    counts = jnp.minimum(counts_sorted, max_points_per_voxel)
    return vcoords, vpi, counts, num_voxels


def voxel_pooling(points, features, voxel_size, position_fn: str = "average",
                  feature_fn: str = "average", max_voxels: int = 4096):
    """Pool features of points falling in the same voxel
    (ref: ml/impl/misc/VoxelPooling.h). Returns (pooled_positions,
    pooled_features, valid_mask) with fixed cap max_voxels."""
    points = jnp.asarray(points, jnp.float32)
    features = jnp.asarray(features, jnp.float32)
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    big = jnp.int32(2**30)
    uniq, seg = jnp.unique(
        coords, axis=0, size=max_voxels, fill_value=big, return_inverse=True
    )
    seg = seg.reshape(-1).astype(jnp.int32)
    valid = uniq[:, 0] < big
    ones = jnp.ones((points.shape[0],), jnp.float32)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=max_voxels)
    denom = jnp.maximum(cnt, 1.0)
    if position_fn == "average":
        pos = jax.ops.segment_sum(points, seg, num_segments=max_voxels) / denom[:, None]
    elif position_fn == "center":
        pos = (uniq.astype(jnp.float32) + 0.5) * voxel_size
    else:  # nearest_neighbor: point closest to voxel mean
        pos = jax.ops.segment_sum(points, seg, num_segments=max_voxels) / denom[:, None]
    if feature_fn == "average":
        feat = jax.ops.segment_sum(features, seg, num_segments=max_voxels) / denom[:, None]
    elif feature_fn == "max":
        feat = jax.ops.segment_max(features, seg, num_segments=max_voxels)
        feat = jnp.where(valid[:, None], feat, 0.0)
    else:  # min
        feat = jax.ops.segment_min(features, seg, num_segments=max_voxels)
        feat = jnp.where(valid[:, None], feat, 0.0)
    return pos, feat, valid


# ----------------------------------------------------------- neighborhoods --
def ball_query(points, queries, radius: float, nsample: int):
    """(ref: ml/contrib/BallQuery.cu ball_query_kernel): indices of up to
    nsample points within radius of each query; empty slots repeat the first
    found index (the reference's convention), all -1 when none."""
    idx, d2, cnt = nns.hybrid_search(queries, points, radius, nsample)
    first = idx[:, :1]
    filled = jnp.where(idx >= 0, idx, jnp.broadcast_to(first, idx.shape))
    return jnp.where(cnt[:, None] > 0, filled, -1), cnt


def knn_search(queries, points, k: int):
    """GEMM k-NN (ref: ml/contrib KnnSearch / core NNS)."""
    return nns.knn_search(queries, points, k)


def fixed_radius_search(queries, points, radius: float, max_nn: int = 64):
    return nns.fixed_radius_search(queries, points, radius, max_nn)


def three_nn(queries, points):
    """3 nearest neighbors + inverse-distance weights
    (ref: ml/contrib/InterpolatePoints.cu three_nn)."""
    idx, d2 = nns.knn_search(queries, points, 3)
    d2 = jnp.maximum(d2, 1e-10)
    w = 1.0 / d2
    w = w / jnp.sum(w, -1, keepdims=True)
    return idx, w


def three_interpolate(features, idx, weights):
    """Weighted feature interpolation (ref: InterpolatePoints.cu
    three_interpolate): features (M, C), idx (N, 3), weights (N, 3) -> (N, C)."""
    return jnp.einsum("nkc,nk->nc", features[jnp.maximum(idx, 0)], weights)


def reduce_subarrays_sum(values, row_splits):
    """Sum each CSR row (ref: ml/impl/misc/ReduceSubarraysSum.h)."""
    n = values.shape[0]
    rows = jnp.searchsorted(row_splits, jnp.arange(n), side="right") - 1
    return jax.ops.segment_sum(values, rows, num_segments=row_splits.shape[0] - 1)


def invert_neighbors_list(num_points: int, neighbors_index, row_splits, k: int = 64):
    """Invert a CSR neighbor list (ref: ml/impl/misc/InvertNeighborsList.h):
    who lists me as a neighbor? Fixed cap k per inverted row, -1 padded."""
    n_edges = neighbors_index.shape[0]
    src = jnp.searchsorted(row_splits, jnp.arange(n_edges), side="right") - 1
    dst = neighbors_index
    # rank of edge within its destination bucket via sort
    order = jnp.argsort(dst)
    sdst = dst[order]
    is_first = jnp.concatenate([jnp.array([True]), sdst[1:] != sdst[:-1]])
    first_pos = jnp.where(is_first, jnp.arange(n_edges), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, first_pos)
    within = jnp.arange(n_edges) - seg_start
    ok = (within < k) & (sdst >= 0) & (sdst < num_points)
    flat = jnp.where(ok, sdst * k + within, num_points * k)
    out = jnp.full((num_points * k + 1,), -1, jnp.int32)
    out = out.at[flat].set(src[order].astype(jnp.int32), mode="drop")
    inv = out[:-1].reshape(num_points, k)
    counts = jax.ops.segment_sum(
        jnp.ones((n_edges,), jnp.int32), jnp.clip(dst, 0, num_points),
        num_segments=num_points + 1,
    )[:num_points]
    return inv, jnp.minimum(counts, k)


def ragged_to_dense(values, row_splits, out_col_size: int, default_value):
    """CSR -> dense padded (ref: ml/impl/misc/RaggedToDense.h)."""
    n_rows = row_splits.shape[0] - 1
    n = values.shape[0]
    rows = jnp.searchsorted(row_splits, jnp.arange(n), side="right") - 1
    within = jnp.arange(n) - row_splits[rows]
    ok = within < out_col_size
    flat = jnp.where(ok, rows * out_col_size + within, n_rows * out_col_size)
    out = jnp.full((n_rows * out_col_size + 1,) + values.shape[1:], default_value, values.dtype)
    out = out.at[flat].set(values, mode="drop")
    return out[:-1].reshape((n_rows, out_col_size) + values.shape[1:])


# ------------------------------------------------------------- boxes / NMS --
def _rot_box_corners(boxes):
    """BEV corners of (x, z, dx, dz, yaw) boxes -> (N, 4, 2)."""
    x, z, dx, dz, yaw = (boxes[:, i] for i in range(5))
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    ex, ez = dx / 2, dz / 2
    local = jnp.stack(
        [jnp.stack([ex, ez], -1), jnp.stack([-ex, ez], -1),
         jnp.stack([-ex, -ez], -1), jnp.stack([ex, -ez], -1)], 1
    )  # (N,4,2)
    R = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)  # (N,2,2)
    return jnp.einsum("nij,nkj->nki", R, local) + jnp.stack([x, z], -1)[:, None, :]


def _poly_clip(subject, clip_pts):
    """Sutherland-Hodgman clip of polygon `subject` (padded (V,2) + count) by
    convex quad clip_pts (4,2). Fixed capacity 16 vertices."""
    CAP = 16

    def clip_edge(poly_cnt, edge):
        poly, cnt = poly_cnt
        a, b = edge
        d = b - a

        def inside(p):
            return d[0] * (p[..., 1] - a[1]) - d[1] * (p[..., 0] - a[0]) >= -1e-9

        idx0 = jnp.arange(CAP)
        nxt = jnp.roll(poly, -1, axis=0)
        # close the polygon: successor of vertex cnt-1 is vertex 0, not the
        # zero-padded slot cnt
        nxt = jnp.where((idx0 == cnt - 1)[:, None], poly[0][None, :], nxt)
        ins_cur = inside(poly)
        ins_nxt = inside(nxt)
        t_den = jnp.sum((nxt - poly) * jnp.array([-d[1], d[0]]), -1)
        t_num = -( -d[1] * (poly[:, 0] - a[0]) + d[0] * (poly[:, 1] - a[1]))
        t = t_num / jnp.where(jnp.abs(t_den) > 1e-12, t_den, 1.0)
        inter = poly + t[:, None] * (nxt - poly)

        idx = jnp.arange(CAP)
        valid = idx < cnt
        emit_cur = ins_cur & valid
        emit_int = (ins_cur != ins_nxt) & valid
        # output order: for each input vertex emit [cur?, inter?]
        out_pts = jnp.zeros((2 * CAP, 2))
        out_ok = jnp.zeros((2 * CAP,), bool)
        out_pts = out_pts.at[0::2].set(poly).at[1::2].set(inter)
        out_ok = out_ok.at[0::2].set(emit_cur).at[1::2].set(emit_int)
        # compact
        pos = jnp.cumsum(out_ok.astype(jnp.int32)) - 1
        newp = jnp.zeros((CAP + 1, 2))
        tgt = jnp.where(out_ok & (pos < CAP), pos, CAP)
        newp = newp.at[tgt].set(out_pts, mode="drop")
        newc = jnp.minimum(jnp.sum(out_ok.astype(jnp.int32)), CAP)
        return (newp[:CAP], newc), None

    edges = jnp.stack([clip_pts, jnp.roll(clip_pts, -1, 0)], 1)  # (4,2,2)
    poly0 = jnp.zeros((CAP, 2)).at[:4].set(subject)
    (poly, cnt), _ = jax.lax.scan(clip_edge, (poly0, jnp.int32(4)), edges)
    return poly, cnt


def _poly_area(poly, cnt):
    CAP = poly.shape[0]
    nxt = jnp.roll(poly, -1, axis=0)
    idx = jnp.arange(CAP)
    # close the polygon at cnt-1 -> 0
    nxt = jnp.where((idx == cnt - 1)[:, None], poly[0][None, :], nxt)
    cross = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    cross = jnp.where(idx < cnt, cross, 0.0)
    return 0.5 * jnp.abs(jnp.sum(cross))


def iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU (ref: ml/contrib/IoU.cu IoUBev): boxes (x, z, dx, dz,
    yaw). Exact polygon-clipping intersection, all pairs (A, B)."""
    ca = _rot_box_corners(jnp.asarray(boxes_a, jnp.float32))
    cb = _rot_box_corners(jnp.asarray(boxes_b, jnp.float32))
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]

    def pair(sa, sb):
        poly, cnt = _poly_clip(sa, sb)
        return _poly_area(poly, cnt)

    inter = jax.vmap(lambda sa: jax.vmap(lambda sb: pair(sa, sb))(cb))(ca)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def iou_3d(boxes_a, boxes_b):
    """3D IoU of (x, y, z, dx, dy, dz, yaw) boxes, yaw about y
    (ref: ml/contrib/IoU.cu IoU3d): BEV intersection x vertical overlap."""
    bev_a = boxes_a[:, [0, 2, 3, 5, 6]]
    bev_b = boxes_b[:, [0, 2, 3, 5, 6]]
    ca = _rot_box_corners(jnp.asarray(bev_a, jnp.float32))
    cb = _rot_box_corners(jnp.asarray(bev_b, jnp.float32))

    def pair(sa, sb):
        poly, cnt = _poly_clip(sa, sb)
        return _poly_area(poly, cnt)

    inter_bev = jax.vmap(lambda sa: jax.vmap(lambda sb: pair(sa, sb))(cb))(ca)
    ymin_a, ymax_a = boxes_a[:, 1] - boxes_a[:, 4] / 2, boxes_a[:, 1] + boxes_a[:, 4] / 2
    ymin_b, ymax_b = boxes_b[:, 1] - boxes_b[:, 4] / 2, boxes_b[:, 1] + boxes_b[:, 4] / 2
    h = jnp.maximum(
        jnp.minimum(ymax_a[:, None], ymax_b[None, :])
        - jnp.maximum(ymin_a[:, None], ymin_b[None, :]),
        0.0,
    )
    inter = inter_bev * h
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return inter / jnp.maximum(vol_a[:, None] + vol_b[None, :] - inter, 1e-9)


def nms(boxes, scores, iou_threshold: float):
    """Rotated-BEV NMS (ref: ml/contrib/Nms.cu): greedy suppression in score
    order, expressed as a lax.fori_loop over the score-sorted list with a
    precomputed all-pairs IoU matrix. Returns a keep mask (N,) bool."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    iou = iou_bev(boxes[order], boxes[order])

    def body(i, keep):
        sup = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & keep[i]
        return keep & ~sup

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


# ------------------------------------------------------------ convolutions --
def continuous_conv(
    features, points, queries, weights, extents, max_nn: int = 32,
    interpolation: str = "linear",
):
    """Continuous convolution (ref: ml/impl/continuous_conv/ContinuousConv.h,
    Ummenhofer & Koltun, Fluids'20): for each query, gather neighbors in a
    box of `extents`, map relative positions into the filter grid via
    ball-to-cube + linear interpolation, and contract with the filter bank.

    features (N, Cin), points (N, 3), queries (M, 3),
    weights (kx, ky, kz, Cin, Cout), extents scalar or (3,). Returns (M, Cout).

    TPU notes: the gather is a radius search; the filter contraction is one
    einsum (rides the MXU). Gradients wrt features AND weights come from jax
    autodiff (replacing ContinuousConvBackpropFilter.h).
    """
    kx, ky, kz, cin, cout = weights.shape
    import numpy as _np

    # extents must be static (a Python/numpy value): it fixes the search radius
    ext = jnp.broadcast_to(jnp.asarray(extents, jnp.float32), (3,))
    radius = float(_np.max(_np.asarray(extents))) * 0.5 * (3.0**0.5)  # box circumradius
    idx, _, cnt = nns.hybrid_search(queries, points, radius, max_nn)
    valid = idx >= 0
    safe = jnp.maximum(idx, 0)
    rel = (points[safe] - queries[:, None, :]) / (ext * 0.5)  # (M,k,3) in [-1,1]
    inbox = jnp.all(jnp.abs(rel) <= 1.0, -1) & valid

    # ball-to-cube radial mapping (CoordinateTransformation.h) then to grid
    r = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    linf = jnp.max(jnp.abs(rel), axis=-1, keepdims=True)
    scale = jnp.where(r > 1e-8, linf / jnp.maximum(r, 1e-8), 1.0)
    cube = rel * scale if interpolation == "linear" else rel
    grid = (cube + 1.0) * 0.5 * jnp.array([kx - 1, ky - 1, kz - 1], jnp.float32)
    g0 = jnp.floor(grid).astype(jnp.int32)
    frac = grid - g0

    wflat = weights.reshape(kx * ky * kz, cin, cout)
    acc = jnp.zeros((queries.shape[0], max_nn, cin, 1))
    feat = jnp.where(inbox[..., None], features[safe], 0.0)  # (M,k,Cin)

    out = jnp.zeros((queries.shape[0], cout), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                gi = jnp.clip(g0 + jnp.array([dx, dy, dz]), 0,
                              jnp.array([kx - 1, ky - 1, kz - 1]))
                w8 = (
                    jnp.where(dx, frac[..., 0], 1 - frac[..., 0])
                    * jnp.where(dy, frac[..., 1], 1 - frac[..., 1])
                    * jnp.where(dz, frac[..., 2], 1 - frac[..., 2])
                )  # (M,k)
                lin = (gi[..., 0] * ky + gi[..., 1]) * kz + gi[..., 2]  # (M,k)
                wsel = wflat[lin]  # (M,k,Cin,Cout)
                out = out + jnp.einsum("mkc,mkco->mo", feat * w8[..., None], wsel)
    del acc
    # normalize by neighbor count (the reference's normalize=True mode)
    return out / jnp.maximum(cnt, 1)[:, None]


def sparse_conv(features, coords, weights, queries_coords=None):
    """Submanifold sparse convolution on integer voxel coords
    (ref: ml/impl/sparse_conv/SparseConv.h): kernel offsets are looked up in a
    coordinate hashmap; contraction is one einsum per offset (MXU).

    features (N, Cin), coords (N, 3) int32, weights (K, K, K, Cin, Cout) with
    odd K. Output at queries_coords (default: input coords)."""
    K = weights.shape[0]
    cin, cout = weights.shape[3], weights.shape[4]
    if queries_coords is None:
        queries_coords = coords
    from open3d_tpu.core import hashmap as hm

    # coordinate hashmap at load factor <= 0.25: slot -> feature row
    N = coords.shape[0]
    cap = max(4 * N, 64)
    table, slot, ok = hm.activate(
        hm.make_table(cap), hm.pack_coords(coords), max_rounds=32
    )
    feat_by_slot = (
        jnp.zeros((cap + 1, features.shape[1]), features.dtype)
        .at[jnp.where(ok, slot, cap)]
        .set(features)
    )
    half = K // 2
    out = jnp.zeros((queries_coords.shape[0], cout), jnp.float32)
    for ox in range(-half, half + 1):
        for oy in range(-half, half + 1):
            for oz in range(-half, half + 1):
                q = hm.pack_coords(queries_coords + jnp.array([ox, oy, oz], jnp.int32))
                qslot, hit = hm.find(table, q, max_probes=16)
                f = feat_by_slot[jnp.where(hit, qslot, cap)]
                w = weights[ox + half, oy + half, oz + half]  # (Cin,Cout)
                out = out + f @ w
    return out


# --------------------------------------------------- roi pool / devoxelize --
def roi_pool(points, features, boxes, num_sampled_points: int = 512):
    """Pool points + features inside rotated 3D ROI boxes
    (ref: ml/contrib/RoiPoolKernel.cu roipool3dLauncher, PointRCNN-style:
    per box, collect points whose (x, z) lie in the yaw-rotated footprint
    and y within the height span, padded/truncated to num_sampled_points).

    points (N, 3), features (N, C), boxes (B, 7) [cx, cy, cz, dx, dy, dz,
    heading]. Returns (pooled (B, S, 3 + C), empty (B,) bool). TPU shape
    rule: fixed S with repeat-padding of the first hit (the reference pads
    with point 0 of the box the same way).
    """
    N = points.shape[0]
    S = int(num_sampled_points)

    def one_box(box):
        c = box[:3]
        d = box[3:6]
        yaw = box[6]
        ca, sa = jnp.cos(-yaw), jnp.sin(-yaw)
        rel = points - c
        # rotate into box frame around the up (z) axis
        x = rel[:, 0] * ca - rel[:, 1] * sa
        y = rel[:, 0] * sa + rel[:, 1] * ca
        z = rel[:, 2]
        inside = (
            (jnp.abs(x) <= d[0] * 0.5)
            & (jnp.abs(y) <= d[1] * 0.5)
            & (jnp.abs(z) <= d[2] * 0.5)
        )
        from open3d_tpu.core.masking import compact_indices

        idx, cnt = compact_indices(inside, S)
        live = jnp.arange(S) < cnt
        first = jnp.maximum(idx[0], 0)
        sel = jnp.where(live, jnp.maximum(idx, 0), first)  # repeat-pad
        pooled = jnp.concatenate([points[sel], features[sel]], axis=-1)
        pooled = jnp.where((cnt > 0), pooled, 0.0)
        return pooled, cnt == 0

    return jax.vmap(one_box)(boxes)


def trilinear_devoxelize(voxel_features, coords, resolution: int):
    """Trilinear interpolation of dense voxel features at point coords
    (ref: ml/contrib/TrilinearDevoxelize.cu, PVCNN). voxel_features
    (C, R, R, R); coords (N, 3) in voxel units [0, R-1]. Returns
    (features (N, C), indices (N, 8) int32, weights (N, 8)) — indices and
    weights are what the reference returns for the backward pass; here
    jax.grad differentiates through directly as well."""
    R = int(resolution)
    C = voxel_features.shape[0]
    vf = voxel_features.reshape(C, -1)

    g = jnp.clip(coords, 0.0, R - 1 - 1e-5)
    g0 = jnp.floor(g).astype(jnp.int32)
    f = g - g0.astype(jnp.float32)

    idxs = []
    wts = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cx = jnp.minimum(g0[:, 0] + dx, R - 1)
                cy = jnp.minimum(g0[:, 1] + dy, R - 1)
                cz = jnp.minimum(g0[:, 2] + dz, R - 1)
                idxs.append(cx * R * R + cy * R + cz)
                w = (
                    jnp.where(dx, f[:, 0], 1 - f[:, 0])
                    * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                    * jnp.where(dz, f[:, 2], 1 - f[:, 2])
                )
                wts.append(w)
    indices = jnp.stack(idxs, axis=-1)  # (N, 8)
    weights = jnp.stack(wts, axis=-1)  # (N, 8)
    gathered = vf[:, indices]  # (C, N, 8)
    out = jnp.sum(gathered * weights[None], axis=-1)  # (C, N)
    return out.T, indices.astype(jnp.int32), weights
