"""Dense RGB-D odometry, TPU-native.

Reference surface: t/pipelines/odometry/RGBDOdometry.{h,cpp} —
RGBDOdometryMultiScale (h:145) with methods {PointToPlane, Intensity, Hybrid}
(h:23-28), per-method single-iteration kernels ComputeOdometryResult{...}
(h:183-301), Jacobians in kernel/RGBDOdometryJacobianImpl.h
(GetJacobianPointToPlane:106, Intensity:164, Hybrid:233), and loss params
OdometryLossParams (h:87: depth_outlier_trunc 0.07, depth/intensity Huber
deltas 0.05/0.1).

TPU design: each pyramid level is ONE jitted Gauss-Newton lax.while_loop over
all pixels — the per-pixel Jacobian rows feed a (6,HW)@(HW,6) MXU matmul
instead of the reference's 29-float block reduction, and convergence tests
stay on device (the reference does a D2H sync per iteration,
RGBDOdometry.cpp:160-186).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from open3d_tpu.core import lie, linalg
from open3d_tpu.geometry import image as im
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.geometry.rgbd import RGBDImage

POINT_TO_PLANE = "point_to_plane"
INTENSITY = "intensity"
HYBRID = "hybrid"


@dataclasses.dataclass(frozen=True)
class OdometryConvergenceCriteria:
    """(ref: RGBDOdometry.h:30)"""

    max_iteration: int = 10
    relative_rmse: float = 1e-6
    relative_fitness: float = 1e-6


@dataclasses.dataclass(frozen=True)
class OdometryLossParams:
    """(ref: RGBDOdometry.h:87)"""

    depth_outlier_trunc: float = 0.07
    depth_huber_delta: float = 0.05
    intensity_huber_delta: float = 0.1


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["transformation", "fitness", "inlier_rmse"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class OdometryResult:
    """(ref: odometry/OdometryResult.h) — transformation maps source-frame
    points into the target frame."""

    transformation: jnp.ndarray  # (4, 4)
    fitness: jnp.ndarray
    inlier_rmse: jnp.ndarray


def _huber_weight(r, delta):
    return delta / jnp.maximum(jnp.abs(r), delta)


def _project(P, intr: PinholeCameraIntrinsic):
    z = P[..., 2]
    zs = jnp.maximum(z, 1e-6)
    u = P[..., 0] / zs * intr.fx + intr.cx
    v = P[..., 1] / zs * intr.fy + intr.cy
    inb = (z > 1e-4) & (u >= 0) & (u <= intr.width - 1) & (v >= 0) & (v <= intr.height - 1)
    return u, v, inb


def _nearest_sample(img, u, v):
    """Nearest-pixel sample via FLAT linearized row indices (~9x faster
    than 2-D gathers on TPU). img (H, W) or (H, W, C)."""
    H, W = img.shape[0], img.shape[1]
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    lin = vi * W + ui
    if img.ndim == 3:
        return img.reshape(H * W, -1)[lin]
    return img.reshape(H * W)[lin]


class _LevelData:
    """Per-pyramid-level precomputed maps, flattened to (HW, ...) rows.

    Target maps a warp samples together are PACKED on the channel axis so
    every association costs ONE row gather: vtx+normal (6 channels) for
    point-to-plane, depth+intensity (2) for the bilinear hybrid/intensity
    warp, vtx+grad_valid (4) for their validity/correspondence lookup."""

    def __init__(self, src_vtx, src_inten, tgt_vtx, tgt_nrm, tgt_inten, intr):
        self.intr = intr
        self.src_pts = src_vtx.reshape(-1, 3)
        self.src_valid = self.src_pts[:, 2] > 0
        self.src_inten = None if src_inten is None else src_inten.reshape(-1)
        self.tgt_vtx = tgt_vtx
        self.tgt_nrm = tgt_nrm
        self.tgt_depth = tgt_vtx[..., 2]
        self.tgt_inten = tgt_inten
        # gradient stencils touching invalid (depth==0) pixels are garbage —
        # erode the validity map so they are rejected at association time
        self.tgt_grad_valid = im.erode_mask(self.tgt_depth > 0.0, 1)
        self.tgt_vtx_nrm = jnp.concatenate([tgt_vtx, tgt_nrm], axis=-1)
        self.tgt_vtx_gv = jnp.concatenate(
            [tgt_vtx, self.tgt_grad_valid[..., None].astype(jnp.float32)],
            axis=-1,
        )
        if tgt_inten is not None:
            self.tgt_depth_inten = jnp.stack([self.tgt_depth, tgt_inten], -1)


def _rows_point_to_plane(ld: _LevelData, T, loss: OdometryLossParams):
    P = lie.transform_points(T, ld.src_pts)
    u, v, inb = _project(P, ld.intr)
    qn = _nearest_sample(ld.tgt_vtx_nrm, u, v)  # one packed gather
    q, n = qn[:, :3], qn[:, 3:]
    valid = ld.src_valid & inb & (q[:, 2] > 0) & (jnp.sum(n * n, axis=-1) > 0.5)
    r = jnp.sum((P - q) * n, axis=-1)
    valid &= jnp.abs(r) < loss.depth_outlier_trunc
    w = valid.astype(jnp.float32) * _huber_weight(r, loss.depth_huber_delta)
    J = jnp.concatenate([jnp.cross(P, n), n], axis=-1)
    return J, r, w, valid, q


def _intensity_rows(ld: _LevelData, P, u, v, base_valid, loss):
    uv = jnp.stack([u, v], axis=-1)
    it, gx, gy = im.bilinear_sample_with_grad(ld.tgt_inten, uv)
    z = jnp.maximum(P[:, 2], 1e-6)
    # dI/dP = gx * du/dP + gy * dv/dP
    fgx = gx * ld.intr.fx / z
    fgy = gy * ld.intr.fy / z
    G = jnp.stack([fgx, fgy, -(fgx * P[:, 0] + fgy * P[:, 1]) / z], axis=-1)
    r = it - ld.src_inten
    w = base_valid.astype(jnp.float32) * _huber_weight(r, loss.intensity_huber_delta)
    J = jnp.concatenate([jnp.cross(P, G), G], axis=-1)
    return J, r, w


def _rows_intensity(ld: _LevelData, T, loss: OdometryLossParams):
    P = lie.transform_points(T, ld.src_pts)
    u, v, inb = _project(P, ld.intr)
    vg = _nearest_sample(ld.tgt_vtx_gv, u, v)  # vtx(3) + grad_valid packed
    q, dt, gv = vg[:, :3], vg[:, 2], vg[:, 3] > 0.5
    valid = ld.src_valid & inb & (dt > 0) & (jnp.abs(dt - P[:, 2]) < loss.depth_outlier_trunc)
    valid &= gv
    J, r, w = _intensity_rows(ld, P, u, v, valid, loss)
    return J, r, w, valid, q


def _rows_hybrid(ld: _LevelData, T, loss: OdometryLossParams):
    """Depth + intensity residuals, lambda = 0.5 each (ref: GetJacobianHybrid,
    RGBDOdometryJacobianImpl.h:233). Depth and intensity share one packed
    4-corner bilinear gather."""
    P = lie.transform_points(T, ld.src_pts)
    u, v, inb = _project(P, ld.intr)
    uv = jnp.stack([u, v], axis=-1)
    di, gx2, gy2 = im.bilinear_sample_with_grad(ld.tgt_depth_inten, uv)
    dt, it = di[:, 0], di[:, 1]
    dgx, igx = gx2[:, 0], gx2[:, 1]
    dgy, igy = gy2[:, 0], gy2[:, 1]
    vg = _nearest_sample(ld.tgt_vtx_gv, u, v)
    q, gv = vg[:, :3], vg[:, 3] > 0.5
    valid = ld.src_valid & inb & (dt > 0) & (jnp.abs(dt - P[:, 2]) < loss.depth_outlier_trunc)
    valid &= gv

    z = jnp.maximum(P[:, 2], 1e-6)
    # intensity term (shares the packed bilinear sample)
    fgx = igx * ld.intr.fx / z
    fgy = igy * ld.intr.fy / z
    Gi = jnp.stack([fgx, fgy, -(fgx * P[:, 0] + fgy * P[:, 1]) / z], axis=-1)
    ri = it - ld.src_inten
    wi = valid.astype(jnp.float32) * _huber_weight(ri, loss.intensity_huber_delta)
    Ji = jnp.concatenate([jnp.cross(P, Gi), Gi], axis=-1)

    # depth term: r_d = D_t(u(P), v(P)) - P_z
    fgx = dgx * ld.intr.fx / z
    fgy = dgy * ld.intr.fy / z
    Gd = jnp.stack(
        [fgx, fgy, -(fgx * P[:, 0] + fgy * P[:, 1]) / z - 1.0], axis=-1
    )
    rd = dt - P[:, 2]
    wd = valid.astype(jnp.float32) * _huber_weight(rd, loss.depth_huber_delta)
    Jd = jnp.concatenate([jnp.cross(P, Gd), Gd], axis=-1)

    sqrt_l = jnp.sqrt(0.5)
    J = jnp.concatenate([sqrt_l * Ji, sqrt_l * Jd], axis=0)
    r = jnp.concatenate([sqrt_l * ri, sqrt_l * rd], axis=0)
    w = jnp.concatenate([wi, wd], axis=0)
    return J, r, w, valid, q


_ROWS = {POINT_TO_PLANE: _rows_point_to_plane, INTENSITY: _rows_intensity, HYBRID: _rows_hybrid}


def _gn_level(ld: _LevelData, T0, method: str, criteria: OdometryConvergenceCriteria, loss):
    rows = _ROWS[method]

    def cond(carry):
        T, prev_rmse, it, converged = carry
        return (it < criteria.max_iteration) & ~converged

    def body(carry):
        T, prev_rmse, it, converged = carry
        J, r, w, valid, _ = rows(ld, T, loss)
        Jw = J * w[:, None]
        JtJ = Jw.T @ J
        Jtr = Jw.T @ r
        xi = linalg.solve_gn_6x6(JtJ, Jtr)
        T_new = lie.se3_exp(xi) @ T
        n_in = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        rmse = jnp.sqrt(jnp.sum(jnp.where(w > 0, r * r, 0.0)) / n_in)
        conv = (it > 0) & (jnp.abs(prev_rmse - rmse) < criteria.relative_rmse)
        return (T_new, rmse, it + 1, conv)

    init = (T0, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    T, _, _, _ = jax.lax.while_loop(cond, body, init)
    return T


def rgbd_odometry_multi_scale(
    source: RGBDImage,
    target: RGBDImage,
    intrinsic: PinholeCameraIntrinsic,
    init: Optional[jnp.ndarray] = None,
    method: str = HYBRID,
    criteria: Sequence[OdometryConvergenceCriteria] = (
        OdometryConvergenceCriteria(10),
        OdometryConvergenceCriteria(5),
        OdometryConvergenceCriteria(3),
    ),
    loss: OdometryLossParams = OdometryLossParams(),
    bilateral_filter: bool = True,
    target_normals: Optional[jnp.ndarray] = None,
) -> OdometryResult:
    """Coarse-to-fine dense odometry (ref: RGBDOdometryMultiScale,
    RGBDOdometry.cpp:56-186). Depths must already be metric float32 with 0 as
    invalid (use image.clip_transform). Returns T such that
    target_point ~= T @ source_point (source-to-target, reference convention).

    target_normals: optional (H, W, 3) unit normal map for the target
    (e.g. the raycaster's TSDF-gradient normals); when given it replaces
    the vertex-map cross-product normals at every pyramid level.
    """
    n_levels = len(criteria)

    src_depth_pyr = im.build_depth_pyramid(source.depth, n_levels)
    tgt_depth_pyr = im.build_depth_pyramid(target.depth, n_levels)
    tgt_nrm_pyr = (
        im.build_normal_pyramid(target_normals, n_levels)
        if target_normals is not None
        else None
    )
    use_intensity = method in (INTENSITY, HYBRID)
    if use_intensity:
        src_int_pyr = im.build_intensity_pyramid(source.color, n_levels)
        tgt_int_pyr = im.build_intensity_pyramid(target.color, n_levels)

    T = jnp.eye(4, dtype=jnp.float32) if init is None else init.astype(jnp.float32)

    # coarse -> fine
    for lvl in reversed(range(n_levels)):
        intr_l = intrinsic.scaled(0.5**lvl)
        sd = src_depth_pyr[lvl]
        td = tgt_depth_pyr[lvl]
        if bilateral_filter:
            td_f = im.filter_bilateral_depth(td)
            sd_f = im.filter_bilateral_depth(sd)
        else:
            td_f, sd_f = td, sd
        src_vtx = im.create_vertex_map(sd_f, intr_l)
        tgt_vtx = im.create_vertex_map(td_f, intr_l)
        tgt_nrm = (
            tgt_nrm_pyr[lvl]
            if tgt_nrm_pyr is not None
            else im.create_normal_map(tgt_vtx)
        )
        ld = _LevelData(
            src_vtx,
            src_int_pyr[lvl] if use_intensity else None,
            tgt_vtx,
            tgt_nrm,
            tgt_int_pyr[lvl] if use_intensity else None,
            intr_l,
        )
        T = _gn_level(ld, T, method, criteria[n_levels - 1 - lvl], loss)

    # final metrics at the finest level
    tgt_vtx0 = im.create_vertex_map(tgt_depth_pyr[0], intrinsic)
    ld = _LevelData(
        im.create_vertex_map(src_depth_pyr[0], intrinsic),
        src_int_pyr[0] if use_intensity else None,
        tgt_vtx0,
        tgt_nrm_pyr[0] if tgt_nrm_pyr is not None else im.create_normal_map(tgt_vtx0),
        tgt_int_pyr[0] if use_intensity else None,
        intrinsic,
    )
    _, r, w, valid, _ = _ROWS[method](ld, T, loss)
    n_src = jnp.maximum(jnp.sum(ld.src_valid.astype(jnp.float32)), 1.0)
    n_in = jnp.sum(valid.astype(jnp.float32))
    rmse = jnp.sqrt(jnp.sum(jnp.where(w > 0, r * r, 0.0)) / jnp.maximum(n_in, 1.0))
    return OdometryResult(transformation=T, fitness=n_in / n_src, inlier_rmse=rmse)


def compute_odometry_information_matrix(
    source_depth: jnp.ndarray,
    target_depth: jnp.ndarray,
    intrinsic: PinholeCameraIntrinsic,
    transformation: jnp.ndarray,
    dist_threshold: float = 0.07,
) -> jnp.ndarray:
    """6x6 information matrix over projectively-associated vertex pairs
    (ref: ComputeOdometryInformationMatrix, RGBDOdometry.h:301): sum of
    G^T G with G = [-skew(q) | I] on target-frame points q."""
    src_vtx = im.create_vertex_map(source_depth, intrinsic).reshape(-1, 3)
    tgt_vtx = im.create_vertex_map(target_depth, intrinsic)
    P = lie.transform_points(transformation, src_vtx)
    u, v, inb = _project(P, intrinsic)
    q = _nearest_sample(tgt_vtx, u, v)
    valid = (src_vtx[:, 2] > 0) & inb & (q[:, 2] > 0)
    valid &= jnp.sum((P - q) ** 2, axis=-1) < dist_threshold * dist_threshold
    w = valid.astype(jnp.float32)[:, None, None]
    skew = lie.hat(q)
    G = jnp.concatenate([-skew, jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), skew.shape)], axis=-1)
    return jnp.einsum("nij,nik->jk", G * w, G)
