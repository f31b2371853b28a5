"""FPFH + RANSAC/FGR global registration tests.

Mirrors the reference's golden-value strategy
(cpp/tests/t/pipelines/registration/Feature.cpp, Registration.cpp:142+):
structural invariants of FPFH (group normalization, rigid invariance) and
end-to-end transform recovery on synthetic fragments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.core import lie
from open3d_tpu.geometry.pointcloud import PointCloud
from open3d_tpu.ops import pointcloud as pc_ops
from open3d_tpu.pipelines import features, global_registration as gr


def _make_cloud(n=512, key=0):
    """Structured (non-degenerate) cloud: noisy multi-plane corner scene."""
    rng = np.random.RandomState(key)
    per = n // 4
    pts = []
    # three orthogonal planes + a diagonal ridge: rich normal variation
    xy = rng.uniform(-1, 1, (per, 2))
    pts.append(np.c_[xy, 0.05 * np.sin(3 * xy[:, :1])])
    xy = rng.uniform(-1, 1, (per, 2))
    pts.append(np.c_[xy[:, :1], 0.05 * np.cos(3 * xy[:, 1:]), xy[:, 1:]])
    xy = rng.uniform(-1, 1, (per, 2))
    pts.append(np.c_[0.05 * np.sin(2 * xy[:, :1]), xy])
    xy = rng.uniform(-1, 1, (n - 3 * per, 2))
    pts.append(np.c_[xy[:, :1], xy[:, 1:], 0.4 * xy[:, :1] + 0.3 * xy[:, 1:]])
    pos = np.concatenate(pts).astype(np.float32)
    pos += rng.normal(0, 0.005, pos.shape).astype(np.float32)
    pcd = PointCloud.create(pos)
    return pc_ops.estimate_normals(pcd, max_nn=20)


def _rigid(angle=0.4, t=(0.3, -0.2, 0.5)):
    xi = jnp.asarray([0.0, 0.0, 0.0, 0.1, angle, 0.2], jnp.float32)
    T = lie.se3_exp(xi)
    return T.at[:3, 3].set(jnp.asarray(t, jnp.float32))


class TestFPFH:
    def test_shape_and_masking(self):
        pcd = _make_cloud(256)
        f = features.compute_fpfh_feature(pcd, radius=0.5, max_nn=30)
        assert f.shape == (256, 33)
        assert bool(jnp.all(jnp.isfinite(f)))
        # masked-out rows yield zero features
        m = pcd.mask.at[:10].set(False)
        pcd2 = PointCloud(pcd.positions, m, pcd.attrs)
        f2 = features.compute_fpfh_feature(pcd2, radius=0.5, max_nn=30)
        assert float(jnp.max(jnp.abs(f2[:10]))) == 0.0

    def test_rigid_invariance(self):
        """FPFH is a function of relative geometry — invariant to SE(3)."""
        pcd = _make_cloud(256)
        T = _rigid()
        moved = pcd.transform(T)
        f0 = features.compute_fpfh_feature(pcd, radius=0.5, max_nn=30)
        f1 = features.compute_fpfh_feature(moved, radius=0.5, max_nn=30)
        # histograms over ~30 neighbors: allow small binning jitter
        diff = jnp.abs(f0 - f1)
        assert float(jnp.mean(diff)) < 1.5

    def test_mutual_correspondences_identity(self):
        pcd = _make_cloud(256)
        f = features.compute_fpfh_feature(pcd, radius=0.5, max_nn=30)
        corres, valid = features.correspondences_from_features(f, f, mutual_filter=True)
        # matching a cloud against itself must give the identity map
        idx = jnp.arange(256)
        assert float(jnp.mean((corres == idx) & valid)) > 0.95


class TestRANSAC:
    def test_recovers_rigid_transform(self):
        src = _make_cloud(512, key=1)
        T_gt = _rigid()
        tgt = src.transform(T_gt)
        fs = features.compute_fpfh_feature(src, radius=0.5, max_nn=30)
        ft = features.compute_fpfh_feature(tgt, radius=0.5, max_nn=30)
        res = gr.registration_ransac_based_on_feature_matching(
            src, tgt, fs, ft, max_correspondence_distance=0.05,
            criteria=gr.RANSACConvergenceCriteria(max_iteration=4096),
            key=jax.random.PRNGKey(3),
        )
        assert float(res.fitness) > 0.7
        rot_err, trans_err = lie.pose_distance(res.transformation, T_gt)
        assert float(trans_err) < 0.05
        assert float(rot_err) < 0.05

    def test_correspondence_ransac_with_outliers(self):
        src = _make_cloud(256, key=2)
        T_gt = _rigid(0.2, (0.1, 0.2, -0.1))
        tgt = src.transform(T_gt)
        n = 256
        corres = jnp.arange(n, dtype=jnp.int32)
        # corrupt 40% of correspondences
        rng = np.random.RandomState(0)
        bad = rng.rand(n) < 0.4
        perm = rng.permutation(n)
        corres = jnp.where(jnp.asarray(bad), jnp.asarray(perm, jnp.int32), corres)
        res = gr.registration_ransac_from_correspondences(
            src, tgt, corres, jnp.ones((n,), bool), 0.05,
            criteria=gr.RANSACConvergenceCriteria(max_iteration=2048),
        )
        rot_err, trans_err = lie.pose_distance(res.transformation, T_gt)
        assert float(trans_err) < 0.03
        assert float(rot_err) < 0.03


class TestFGR:
    def test_recovers_rigid_transform(self):
        src = _make_cloud(512, key=4)
        T_gt = _rigid(0.3, (0.2, 0.1, -0.3))
        tgt = src.transform(T_gt)
        fs = features.compute_fpfh_feature(src, radius=0.5, max_nn=30)
        ft = features.compute_fpfh_feature(tgt, radius=0.5, max_nn=30)
        res = gr.registration_fgr_based_on_feature_matching(
            src, tgt, fs, ft,
            option=gr.FGROption(maximum_correspondence_distance=0.05),
        )
        rot_err, trans_err = lie.pose_distance(res.transformation, T_gt)
        assert float(trans_err) < 0.05
        assert float(rot_err) < 0.05
