"""Global registration: batched RANSAC + Fast Global Registration (FGR).

Reference surface:
- pipelines/registration/Registration.{h,cpp} —
  RegistrationRANSACBasedOnCorrespondence (h:173) /
  ...BasedOnFeatureMatching (h:199): OpenMP threads each run sequential
  hypothesize-check-evaluate with a critical-section best-keep and
  early exit at confidence 0.999 (cpp:181-257).
- pipelines/registration/CorrespondenceChecker.h — EdgeLength (0.9),
  Distance, Normal checkers.
- pipelines/registration/FastGlobalRegistration.{h,cpp} — advanced matching
  (mutual filter + tuple test, cpp:68-124) then graduated non-convexity on a
  scaled Geman-McClure objective (64 iters, division_factor 1.4).

TPU design: the reference's per-thread sequential RANSAC with early exit is
replaced by *batched hypothesis rounds* — each round draws B hypotheses,
runs all checkers vectorized, scores every surviving hypothesis against the
full correspondence set as one (B, N) batched transform+reduction, and the
confidence early-exit becomes an on-device predicate of a lax.while_loop
over rounds. No host syncs inside the loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from open3d_tpu.core import lie, linalg
from open3d_tpu.geometry.pointcloud import PointCloud
from open3d_tpu.pipelines import features as feat_mod
from open3d_tpu.pipelines.registration import RegistrationResult, _weighted_umeyama


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["max_iteration", "confidence"])
@dataclasses.dataclass(frozen=True)
class RANSACConvergenceCriteria:
    """(ref: RANSACConvergenceCriteria, Registration.h:116 — defaults
    max_iteration=100000, confidence=0.999)"""
    max_iteration: int = 100000
    confidence: float = 0.999


def _sample_compaction(valid):
    """Stable compaction: order[i] = index of i-th valid correspondence."""
    order = jnp.argsort(~valid, stable=True).astype(jnp.int32)
    count = jnp.sum(valid).astype(jnp.int32)
    return order, count


def _check_edge_length(ps, qs, similarity: float):
    """All sampled edges must satisfy the edge-length similarity test
    (ref: CorrespondenceCheckerBasedOnEdgeLength.h:50, default 0.9)."""
    dp = jnp.linalg.norm(ps[:, :, None, :] - ps[:, None, :, :], axis=-1)
    dq = jnp.linalg.norm(qs[:, :, None, :] - qs[:, None, :, :], axis=-1)
    k = ps.shape[1]
    offdiag = ~jnp.eye(k, dtype=bool)[None]
    ok = (dp > similarity * dq) & (dq > similarity * dp)
    return jnp.all(ok | ~offdiag, axis=(1, 2))


def registration_ransac_from_correspondences(
    source: PointCloud,
    target: PointCloud,
    corres: jnp.ndarray,
    corres_valid: jnp.ndarray,
    max_correspondence_distance: float,
    ransac_n: int = 3,
    criteria: RANSACConvergenceCriteria = RANSACConvergenceCriteria(),
    similarity_threshold: float = 0.9,
    batch_size: int = 512,
    key: Optional[jax.Array] = None,
) -> RegistrationResult:
    """Batched-hypothesis RANSAC on given source->target correspondences.

    (ref: RegistrationRANSACBasedOnCorrespondence, Registration.cpp:169-260)
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    dmax2 = jnp.float32(max_correspondence_distance**2)
    src = source.positions
    tgt = target.positions
    order, count = _sample_compaction(corres_valid)
    countf = jnp.maximum(count.astype(jnp.float32), 1.0)
    n_rounds = max(1, -(-int(criteria.max_iteration) // batch_size))

    corres_safe = jnp.maximum(corres, 0)
    all_p = src  # (N, 3)
    all_q = tgt[corres_safe]  # (N, 3)
    w_all = corres_valid.astype(jnp.float32)

    def score_batch(key):
        # draw B x ransac_n correspondence ids from the compacted valid set
        ids = jax.random.randint(key, (batch_size, ransac_n), 0, countf.astype(jnp.int32))
        cid = order[ids]  # (B, n) correspondence rows
        ps = src[cid]  # (B, n, 3)
        qs = tgt[corres_safe[cid]]
        ok = _check_edge_length(ps, qs, similarity_threshold)

        w = jnp.ones((batch_size, ransac_n), jnp.float32)
        Ts = jax.vmap(lambda p, q, ww: _weighted_umeyama(p, q, ww))(ps, qs, w)

        # distance checker on the sampled set
        ps_t = jnp.einsum("bij,bnj->bni", Ts[:, :3, :3], ps) + Ts[:, None, :3, 3]
        ok = ok & jnp.all(jnp.sum((ps_t - qs) ** 2, axis=-1) <= dmax2, axis=1)

        # evaluate every hypothesis over the full correspondence set
        p_t = jnp.einsum("bij,nj->bni", Ts[:, :3, :3], all_p) + Ts[:, None, :3, 3]
        e2 = jnp.sum((p_t - all_q) ** 2, axis=-1)  # (B, N)
        inlier = (e2 <= dmax2) & corres_valid[None, :]
        n_in = jnp.sum(inlier, axis=1).astype(jnp.float32)
        fitness = jnp.where(ok, n_in / countf, -1.0)
        rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, e2, 0.0), axis=1) / jnp.maximum(n_in, 1.0))
        b = jnp.argmax(fitness - 1e-6 * rmse)
        return Ts[b], fitness[b], rmse[b]

    def cond(state):
        rnd, _, best_fit, _, _ = state
        # confidence early exit: iterations needed so that
        # 1 - (1 - fitness^n)^iters >= confidence  (Registration.cpp:249-255)
        p_good = jnp.clip(best_fit, 1e-9, 1.0 - 1e-9) ** ransac_n
        need = jnp.log1p(-criteria.confidence) / jnp.log1p(-p_good)
        done = (rnd * batch_size).astype(jnp.float32) >= need
        return (rnd < n_rounds) & ~done

    def body(state):
        rnd, key, best_fit, best_rmse, best_T = state
        key, sub = jax.random.split(key)
        T, fit, rmse = score_batch(sub)
        better = (fit > best_fit) | ((fit == best_fit) & (rmse < best_rmse))
        return (
            rnd + 1,
            key,
            jnp.where(better, fit, best_fit),
            jnp.where(better, rmse, best_rmse),
            jnp.where(better, T, best_T),
        )

    init = (jnp.int32(0), key, jnp.float32(-1.0), jnp.float32(1e30), jnp.eye(4, dtype=jnp.float32))
    _, _, fit, rmse, T = jax.lax.while_loop(cond, body, init)
    return RegistrationResult(
        transformation=T,
        fitness=jnp.maximum(fit, 0.0),
        inlier_rmse=jnp.where(fit > 0, rmse, 0.0),
        num_iterations=jnp.int32(0),
    )


def registration_ransac_based_on_feature_matching(
    source: PointCloud,
    target: PointCloud,
    source_features: jnp.ndarray,
    target_features: jnp.ndarray,
    max_correspondence_distance: float,
    mutual_filter: bool = True,
    ransac_n: int = 3,
    criteria: RANSACConvergenceCriteria = RANSACConvergenceCriteria(),
    key: Optional[jax.Array] = None,
) -> RegistrationResult:
    """FPFH-matching RANSAC (ref: Registration.h:199)."""
    corres, valid = feat_mod.correspondences_from_features(
        source_features,
        target_features,
        mutual_filter=mutual_filter,
        source_mask=source.mask,
        target_mask=target.mask,
    )
    return registration_ransac_from_correspondences(
        source,
        target,
        corres,
        valid,
        max_correspondence_distance,
        ransac_n=ransac_n,
        criteria=criteria,
        key=key,
    )


# ---------------------------------------------------------------------------
# Fast Global Registration
# ---------------------------------------------------------------------------


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["division_factor", "maximum_correspondence_distance",
                      "iteration_number", "tuple_scale", "maximum_tuple_count",
                      "tuple_test"])
@dataclasses.dataclass(frozen=True)
class FGROption:
    """(ref: FastGlobalRegistrationOption, FastGlobalRegistration.h:33-66)"""
    division_factor: float = 1.4
    maximum_correspondence_distance: float = 0.025
    iteration_number: int = 64
    tuple_scale: float = 0.95
    maximum_tuple_count: int = 1000
    tuple_test: bool = True


def _tuple_test(src, tgt, corres, valid, scale: float, n_tuples: int, key):
    """Random-3-tuple rigidity test: keep correspondences that belong to at
    least one tuple whose three edge-length ratios all fall in
    [scale, 1/scale] (ref: FastGlobalRegistration.cpp:68-124)."""
    order, count = _sample_compaction(valid)
    cnt = jnp.maximum(count, 1)
    ids = jax.random.randint(key, (n_tuples, 3), 0, cnt)
    cid = order[ids]  # (T, 3) correspondence rows
    p = src[cid]
    q = tgt[jnp.maximum(corres, 0)[cid]]

    def edge_ok(a, b):
        dp = jnp.linalg.norm(p[:, a] - p[:, b], axis=-1)
        dq = jnp.linalg.norm(q[:, a] - q[:, b], axis=-1)
        r = dp / jnp.maximum(dq, 1e-12)
        return (r > scale) & (r < 1.0 / scale)

    passed = edge_ok(0, 1) & edge_ok(1, 2) & edge_ok(2, 0)
    keep = jnp.zeros(valid.shape, bool)
    upd = jnp.broadcast_to(passed[:, None], cid.shape)
    keep = keep.at[cid.reshape(-1)].max(upd.reshape(-1))
    return valid & keep


def registration_fgr_based_on_feature_matching(
    source: PointCloud,
    target: PointCloud,
    source_features: jnp.ndarray,
    target_features: jnp.ndarray,
    option: FGROption = FGROption(),
    key: Optional[jax.Array] = None,
) -> RegistrationResult:
    """Fast Global Registration (Zhou, Park, Koltun ECCV'16).

    Graduated non-convexity on scaled Geman-McClure: mu starts at the
    squared max correspondence distance and divides by division_factor every
    4 iterations; per-correspondence line-process weight
    l = (mu / (mu + r^2))^2; each iteration solves a point-to-point
    Gauss-Newton step (ref: FastGlobalRegistration.cpp:126-214)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    k_match, k_tuple = jax.random.split(key)
    corres, valid = feat_mod.correspondences_from_features(
        source_features,
        target_features,
        mutual_filter=True,
        source_mask=source.mask,
        target_mask=target.mask,
    )
    if option.tuple_test:
        corres_valid = _tuple_test(
            source.positions,
            target.positions,
            corres,
            valid,
            option.tuple_scale,
            max(option.maximum_tuple_count * 100, 4096),
            k_tuple,
        )
        # fall back to the mutual set if the tuple test wiped everything out
        corres_valid = jnp.where(jnp.any(corres_valid), corres_valid, valid)
    else:
        corres_valid = valid

    p = source.positions
    q = target.positions[jnp.maximum(corres, 0)]
    w_valid = corres_valid.astype(jnp.float32)
    dmax2 = jnp.float32(option.maximum_correspondence_distance**2)

    def body(carry, it):
        T, mu = carry
        pt = lie.transform_points(T, p)
        r = pt - q  # (N, 3)
        r2 = jnp.sum(r * r, axis=-1)
        l = (mu / (mu + r2)) ** 2 * w_valid  # line-process weight
        # point-to-point GN: rows [-[pt]_x | I] per axis
        J = jnp.concatenate(
            [
                jnp.stack(
                    [
                        jnp.zeros_like(pt[:, 0]), pt[:, 2], -pt[:, 1],
                        -pt[:, 2], jnp.zeros_like(pt[:, 0]), pt[:, 0],
                        pt[:, 1], -pt[:, 0], jnp.zeros_like(pt[:, 0]),
                    ],
                    axis=-1,
                ).reshape(-1, 3, 3),
                jnp.broadcast_to(jnp.eye(3, dtype=pt.dtype), (pt.shape[0], 3, 3)),
            ],
            axis=-1,
        )  # (N, 3, 6); rotational block = -skew(pt) written explicitly
        lw = l[:, None, None]
        JtJ = jnp.einsum("nai,naj->ij", J * lw, J)
        Jtr = jnp.einsum("nai,na->i", J * lw, r)
        xi = linalg.solve_gn_6x6(JtJ, Jtr)  # solves JtJ dx = -Jtr
        T_new = lie.se3_exp(xi) @ T
        mu_new = jnp.where((it + 1) % 4 == 0, jnp.maximum(mu / option.division_factor, dmax2), mu)
        return (T_new, mu_new), None

    extent = source.get_max_bound() - source.get_min_bound()
    span = jnp.max(extent)
    mu0 = jnp.maximum(span * span, dmax2)
    (T, _), _ = jax.lax.scan(
        body, (jnp.eye(4, dtype=jnp.float32), mu0), jnp.arange(option.iteration_number)
    )

    pt = lie.transform_points(T, p)
    e2 = jnp.sum((pt - q) ** 2, axis=-1)
    inlier = (e2 <= dmax2) & corres_valid
    n_in = jnp.sum(inlier).astype(jnp.float32)
    n_tot = jnp.maximum(jnp.sum(corres_valid).astype(jnp.float32), 1.0)
    return RegistrationResult(
        transformation=T,
        fitness=n_in / n_tot,
        inlier_rmse=jnp.sqrt(jnp.sum(jnp.where(inlier, e2, 0.0)) / jnp.maximum(n_in, 1.0)),
        num_iterations=jnp.int32(option.iteration_number),
    )
