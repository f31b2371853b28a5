"""FPFH features + feature matching, TPU-native.

Reference surface: t/pipelines/registration/Feature.{h,cpp}
(ComputeFPFHFeature h:38, CorrespondencesFromFeatures h:60 with mutual
filter) and kernels t/pipelines/kernel/FeatureImpl.h:88-104 (SPFH 3x11-bin
histograms over the Darboux-frame pair angles (alpha, phi, theta), then
distance-weighted neighbor re-aggregation into the 33-dim FPFH).

TPU design: the reference scatters +hist_incr per (point, neighbor) into
per-point bins. Here histogram accumulation is expressed as a dense
(N, K, 11) one-hot contraction summed over K — a batched matmul-shaped
reduction that rides the MXU/VPU with zero atomics; invalid neighbor slots
carry zero weight. Feature matching is a (N, 33) @ (33, M) GEMM 1-NN in
feature space (reference uses a 33-dim KD-tree, Feature.cpp:60+), which on
the MXU is both exact and faster than traversal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open3d_tpu.core import nns
from open3d_tpu.geometry.pointcloud import PointCloud
from open3d_tpu.ops.pointcloud import gather_neighbors

_EPS = 1e-12


def _pair_features(p1, n1, p2, n2):
    """Darboux-frame pair features (f1=theta, f2=alpha, f3=phi, f4=d) for one
    point pair (ref: legacy pipelines/registration/Feature.cpp
    ComputePairFeatures; tensor twin kernel/FeatureImpl.h:27-87).

    Vectorized over leading dims. Returns (f1, f2, f3, f4, valid)."""
    dp = p2 - p1
    d = jnp.linalg.norm(dp, axis=-1)
    valid = d > _EPS
    dsafe = jnp.where(valid, d, 1.0)
    du = dp / dsafe[..., None]

    angle1 = jnp.sum(n1 * du, axis=-1)
    angle2 = jnp.sum(n2 * du, axis=-1)
    # order so the source normal makes the smaller angle with the segment
    swap = jnp.abs(angle1) < jnp.abs(angle2)
    n1c = jnp.where(swap[..., None], n2, n1)
    n2c = jnp.where(swap[..., None], n1, n2)
    du = jnp.where(swap[..., None], -du, du)
    f3 = jnp.where(swap, angle2, angle1)

    v = jnp.cross(du, n1c)
    vnorm = jnp.linalg.norm(v, axis=-1)
    valid = valid & (vnorm > _EPS)
    v = v / jnp.where(vnorm > _EPS, vnorm, 1.0)[..., None]
    w = jnp.cross(n1c, v)
    f2 = jnp.sum(v * n2c, axis=-1)
    f1 = jnp.arctan2(jnp.sum(w * n2c, axis=-1), jnp.sum(n1c * n2c, axis=-1))
    zero = jnp.zeros_like(d)
    return (
        jnp.where(valid, f1, zero),
        jnp.where(valid, f2, zero),
        jnp.where(valid, f3, zero),
        jnp.where(valid, d, zero),
        valid,
    )


def _bin11(f, lo, hi):
    """Map feature to one of 11 bins in [lo, hi] -> (..., 11) one-hot f32."""
    idx = jnp.floor(11.0 * (f - lo) / (hi - lo)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, 10)
    return jax.nn.one_hot(idx, 11, dtype=jnp.float32)


def _spfh(pos, normals, idx, self_index):
    """Per-point SPFH 33-vector from neighbor index table (N, K).

    (ref: kernel/FeatureImpl.h ComputeSPFHFeature — hist_incr =
    100 / (n_neighbors - 1), accumulate into 3 x 11 bins)"""
    nbr_p = gather_neighbors(pos, idx)  # (N, K, 3)
    nbr_n = gather_neighbors(normals, idx)
    p1 = pos[:, None, :]
    n1 = normals[:, None, :]
    f1, f2, f3, _, pf_valid = _pair_features(p1, n1, nbr_p, nbr_n)
    is_self = idx == self_index[:, None]
    w = ((idx >= 0) & ~is_self & pf_valid).astype(jnp.float32)  # (N, K)
    cnt = jnp.sum((idx >= 0) & ~is_self, axis=1).astype(jnp.float32)
    hist_incr = 100.0 / jnp.maximum(cnt, 1.0)

    h1 = _bin11(f1, -jnp.pi, jnp.pi)  # theta
    h2 = _bin11(f2, -1.0, 1.0)  # alpha
    h3 = _bin11(f3, -1.0, 1.0)  # phi
    hist = jnp.concatenate([h1, h2, h3], axis=-1)  # (N, K, 33)
    spfh = jnp.sum(hist * w[..., None], axis=1) * hist_incr[:, None]
    return spfh, cnt


def compute_fpfh_feature(
    pcd: PointCloud,
    radius: float = 0.25,
    max_nn: int = 100,
    nns_grid_threshold: int | None = 65536,
    nns_max_per_cell: int = 64,
) -> jnp.ndarray:
    """33-dim FPFH per point -> (N, 33) f32, zero rows where masked out.

    (ref: t/pipelines/registration/Feature.h:38 ComputeFPFHFeature;
    FeatureImpl.h:88-104 — FPFH_i = SPFH_i + sum_k SPFH_k / d2_ik, each
    11-bin group of the neighbor sum renormalized to 100.)"""
    pos = pcd.positions
    normals = pcd.attrs["normals"]
    N = pos.shape[0]
    idx, d2, _ = nns.hybrid_search(
        pos, pos, radius, max_nn, target_mask=pcd.mask,
        grid_threshold=nns_grid_threshold, max_per_cell=nns_max_per_cell,
    )
    self_index = jnp.arange(N, dtype=jnp.int32)
    spfh, _ = _spfh(pos, normals, idx, self_index)

    # distance-weighted aggregation of neighbor SPFHs
    nbr_spfh = gather_neighbors(spfh, idx)  # (N, K, 33)
    is_self = idx == self_index[:, None]
    wgt = jnp.where((idx >= 0) & ~is_self & (d2 > _EPS), 1.0 / jnp.maximum(d2, _EPS), 0.0)
    agg = jnp.sum(nbr_spfh * wgt[..., None], axis=1)  # (N, 33)

    agg = agg.reshape(N, 3, 11)
    group_sum = jnp.sum(agg, axis=-1, keepdims=True)
    scale = jnp.where(group_sum > _EPS, 100.0 / jnp.maximum(group_sum, _EPS), 0.0)
    fpfh = (agg * scale).reshape(N, 33) + spfh
    return jnp.where(pcd.mask[:, None], fpfh, 0.0)


def correspondences_from_features(
    source_features: jnp.ndarray,
    target_features: jnp.ndarray,
    mutual_filter: bool = False,
    source_mask: jnp.ndarray | None = None,
    target_mask: jnp.ndarray | None = None,
):
    """1-NN in 33-dim feature space via GEMM distance tiles.

    Returns (corres (N,) int32 target index per source point, valid (N,)
    bool). With mutual_filter, valid additionally requires
    nn_target(nn_source(i)) == i (ref: Feature.h:60
    CorrespondencesFromFeatures, mutual_filter semantics)."""
    nn_st, _ = nns.one_nn_search(source_features, target_features, target_mask=target_mask)
    valid = nn_st >= 0
    if source_mask is not None:
        valid = valid & source_mask
    if mutual_filter:
        nn_ts, _ = nns.one_nn_search(target_features, source_features, target_mask=source_mask)
        back = nn_ts[jnp.maximum(nn_st, 0)]
        valid = valid & (back == jnp.arange(nn_st.shape[0], dtype=jnp.int32))
    return jnp.where(valid, nn_st, -1), valid
