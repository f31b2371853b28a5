"""ICP registration tests.

Mirrors the reference's golden-value strategy
(cpp/tests/t/pipelines/registration/Registration.cpp:142-360) but against the
analytic synthetic scene: sample the SDF surface, perturb by a known SE(3),
and require ICP to recover it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.core import lie
from open3d_tpu.data import synthetic
from open3d_tpu.ops import pointcloud as pc_ops
from open3d_tpu.pipelines import registration as reg
from open3d_tpu.pipelines.robust_kernels import RobustKernel, TUKEY


def make_pair(n=4000, seed=0, with_colors=False, perturb=(0.05, 0.04, -0.03, 0.02, -0.03, 0.04)):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    target = synthetic.sample_surface(
        synthetic.default_scene_sdf, k1, n, with_normals=True, with_colors=with_colors
    )
    source = synthetic.sample_surface(
        synthetic.default_scene_sdf, k2, n, with_normals=True, with_colors=with_colors
    )
    T_gt = lie.se3_exp(jnp.array(perturb, jnp.float32))
    # move source AWAY by inverse: ICP should recover T_gt
    source = source.transform(lie.invert_se3(T_gt))
    return source, target, T_gt


def test_umeyama_exact_recovery():
    """Point-to-point on exact correspondences recovers the transform in one
    shot (cross-check vs numpy SVD Kabsch)."""
    key = jax.random.PRNGKey(3)
    p = jax.random.normal(key, (500, 3))
    T_gt = lie.se3_exp(jnp.array([0.4, -0.2, 0.7, 0.3, -0.1, 0.5]))
    q = lie.transform_points(T_gt, p)
    T = reg._weighted_umeyama(p, q, jnp.ones((500,)))
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=1e-4)

    # numpy reference
    pm, qm = np.asarray(p).mean(0), np.asarray(q).mean(0)
    W = (np.asarray(q) - qm).T @ (np.asarray(p) - pm)
    U, S, Vt = np.linalg.svd(W)
    D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R_np = U @ D @ Vt
    np.testing.assert_allclose(np.asarray(T)[:3, :3], R_np, atol=1e-4)


def test_umeyama_degenerate_planar():
    """Planar point sets (rank-2 covariance) still give a valid rotation."""
    key = jax.random.PRNGKey(0)
    p2 = jax.random.normal(key, (200, 2))
    p = jnp.concatenate([p2, jnp.zeros((200, 1))], axis=1)
    T_gt = lie.se3_exp(jnp.array([0.0, 0.0, 0.5, 0.1, 0.2, 0.0]))
    q = lie.transform_points(T_gt, p)
    T = reg._weighted_umeyama(p, q, jnp.ones((200,)))
    R = np.asarray(T[:3, :3])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    assert np.linalg.det(R) > 0.99
    np.testing.assert_allclose(
        np.asarray(lie.transform_points(T, p)), np.asarray(q), atol=1e-3
    )


@pytest.mark.parametrize("estimation", ["point_to_plane", "point_to_point"])
def test_icp_recovers_pose(estimation):
    source, target, T_gt = make_pair()
    est = (
        reg.TransformationEstimationPointToPlane()
        if estimation == "point_to_plane"
        else reg.TransformationEstimationPointToPoint()
    )
    result = reg.icp(
        source,
        target,
        max_correspondence_distance=0.15,
        estimation=est,
        criteria=reg.ICPConvergenceCriteria(max_iteration=50),
    )
    rot_err, trans_err = lie.pose_distance(result.transformation, T_gt)
    assert float(trans_err) < 0.02, (float(rot_err), float(trans_err))
    assert float(rot_err) < 0.02
    assert float(result.fitness) > 0.8
    # two independent 4000-pt samples of a ~100 m^2 scene are ~0.08 m apart,
    # so rmse is bounded below by sampling density, not registration error
    assert float(result.inlier_rmse) < 0.1


def test_icp_with_robust_kernel_and_outliers():
    source, target, T_gt = make_pair(seed=5)
    # corrupt 10% of source points
    key = jax.random.PRNGKey(9)
    n = source.capacity
    bad = jax.random.uniform(key, (n,)) < 0.1
    noise = jax.random.normal(jax.random.PRNGKey(10), (n, 3)) * 0.5
    pos = jnp.where(bad[:, None], source.positions + noise, source.positions)
    source = source.with_attrs()  # copy
    import dataclasses

    source = dataclasses.replace(source, positions=pos)
    est = reg.TransformationEstimationPointToPlane(
        kernel=RobustKernel(TUKEY, scaling_parameter=0.05)
    )
    result = reg.icp(source, target, 0.15, estimation=est,
                     criteria=reg.ICPConvergenceCriteria(max_iteration=50))
    _, trans_err = lie.pose_distance(result.transformation, T_gt)
    assert float(trans_err) < 0.03


def test_multi_scale_icp():
    source, target, T_gt = make_pair(n=6000, perturb=(0.1, -0.08, 0.06, 0.1, -0.06, 0.08))
    result = reg.multi_scale_icp(
        source,
        target,
        voxel_sizes=[0.1, 0.05, 0.025],
        criteria_list=[reg.ICPConvergenceCriteria(max_iteration=20)] * 3,
        max_correspondence_distances=[0.3, 0.15, 0.07],
    )
    rot_err, trans_err = lie.pose_distance(result.transformation, T_gt)
    assert float(trans_err) < 0.02, (float(rot_err), float(trans_err))
    assert float(rot_err) < 0.03


def test_colored_icp_runs():
    source, target, T_gt = make_pair(
        with_colors=True, perturb=(0.02, -0.02, 0.02, 0.01, -0.01, 0.02)
    )
    target = pc_ops.estimate_color_gradients(target, max_nn=20)
    est = reg.TransformationEstimationForColoredICP()
    result = reg.icp(source, target, 0.1, estimation=est,
                     criteria=reg.ICPConvergenceCriteria(max_iteration=30))
    _, trans_err = lie.pose_distance(result.transformation, T_gt)
    assert float(trans_err) < 0.02
    # fitness is capped by sampling density, not alignment: two independent
    # 4000-pt samples evaluated AT ground truth reach ~0.75 at dmax=0.1
    gt_fitness = reg.evaluate_registration(source, target, 0.1, T_gt).fitness
    assert float(result.fitness) > float(gt_fitness) - 0.02


def test_evaluate_registration_identity_on_same_cloud():
    _, target, _ = make_pair()
    result = reg.evaluate_registration(target, target, 0.05)
    assert float(result.fitness) == pytest.approx(1.0)
    assert float(result.inlier_rmse) == pytest.approx(0.0, abs=1e-5)


def test_information_matrix_spd():
    source, target, T_gt = make_pair()
    info = reg.get_information_matrix(source, target, 0.1, T_gt)
    info_np = np.asarray(info)
    np.testing.assert_allclose(info_np, info_np.T, atol=1e-2)
    evals = np.linalg.eigvalsh(info_np)
    assert evals.min() > 0  # full-rank constraint for a real scene


def test_icp_jits_and_caches():
    """The whole ICP call must be jittable (one compile, device-resident)."""
    source, target, _ = make_pair(n=1000)

    @jax.jit
    def run(src, tgt):
        return reg.icp(src, tgt, 0.15,
                       criteria=reg.ICPConvergenceCriteria(max_iteration=10))

    r1 = run(source, target)
    r2 = run(source, target)  # cached
    assert float(r1.fitness) == float(r2.fitness)
