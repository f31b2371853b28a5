"""RGB-D odometry tests against the synthetic renderer's GT poses.

Reference strategy analog: cpp/tests/t/pipelines/odometry/RGBDOdometry.cpp
golden-value tests; here ground truth is exact (analytic scene + exact
extrinsics), so we check pose recovery directly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.core import lie
from open3d_tpu.data import synthetic
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.geometry.rgbd import RGBDImage
from open3d_tpu.pipelines import odometry as odo

INTR = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)


def render_pair(baseline=0.03):
    """Two nearby frames with exact relative pose."""
    e0 = synthetic.look_at((1.2, 0.3, 0.0), (0.0, 0.8, 0.0))
    e1 = synthetic.look_at((1.2 - baseline, 0.3 + baseline * 0.5, baseline), (0.02, 0.8, 0.0))
    d0, c0 = synthetic.render_depth(synthetic.default_scene_sdf, INTR, e0)
    d1, c1 = synthetic.render_depth(synthetic.default_scene_sdf, INTR, e1)
    # GT source(frame0)->target(frame1) camera transform: x_1 = T_gt x_0
    T_gt = e1 @ jnp.linalg.inv(e0)
    return RGBDImage(color=c0, depth=d0), RGBDImage(color=c1, depth=d1), T_gt


@pytest.mark.parametrize("method", [odo.POINT_TO_PLANE, odo.INTENSITY, odo.HYBRID])
def test_odometry_recovers_pose(method):
    src, tgt, T_gt = render_pair()
    result = odo.rgbd_odometry_multi_scale(src, tgt, INTR, method=method)
    rot_err, trans_err = lie.pose_distance(result.transformation, T_gt)
    assert float(trans_err) < 0.01, (method, float(rot_err), float(trans_err))
    assert float(rot_err) < 0.01
    assert float(result.fitness) > 0.5


def test_odometry_identity_on_same_frame():
    src, _, _ = render_pair()
    result = odo.rgbd_odometry_multi_scale(src, src, INTR, method=odo.POINT_TO_PLANE)
    rot_err, trans_err = lie.pose_distance(
        result.transformation, jnp.eye(4, dtype=jnp.float32)
    )
    assert float(trans_err) < 1e-3
    assert float(rot_err) < 1e-3
    assert float(result.inlier_rmse) < 5e-3


def test_odometry_information_matrix():
    src, tgt, T_gt = render_pair()
    info = odo.compute_odometry_information_matrix(src.depth, tgt.depth, INTR, T_gt)
    info_np = np.asarray(info)
    np.testing.assert_allclose(info_np, info_np.T, atol=1e-2)
    assert np.linalg.eigvalsh(info_np).min() > 0


def test_odometry_larger_baseline_hybrid():
    src, tgt, T_gt = render_pair(baseline=0.08)
    result = odo.rgbd_odometry_multi_scale(
        src, tgt, INTR, method=odo.HYBRID,
        criteria=[odo.OdometryConvergenceCriteria(15)] * 3,
    )
    _, trans_err = lie.pose_distance(result.transformation, T_gt)
    assert float(trans_err) < 0.015
