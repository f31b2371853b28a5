"""Segmentation / clustering / keypoints / hull tests.

Mirrors the reference's golden-style pipeline tests (SURVEY.md section 4):
synthetic scenes with known structure, assertions on recovered structure.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.ops import segmentation as seg


def _plane_plus_noise(seed=0, n_plane=600, n_noise=120):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-1, 1, (n_plane, 2))
    plane = np.column_stack([xy, 0.02 * np.ones(n_plane)])  # z = 0.02
    noise = rng.uniform(-1, 1, (n_noise, 3)) + np.array([0, 0, 1.5])
    return np.vstack([plane, noise]).astype(np.float32), n_plane


def test_segment_plane_recovers_dominant_plane():
    pts, n_plane = _plane_plus_noise()
    plane, inliers = seg.segment_plane(
        jnp.asarray(pts), distance_threshold=0.01, num_iterations=64
    )
    plane = np.asarray(plane)
    inliers = np.asarray(inliers)
    # normal ~ +-z, offset ~ -+0.02
    assert abs(abs(plane[2]) - 1.0) < 1e-3
    assert abs(plane[3] + np.sign(plane[2]) * 0.02) < 5e-3
    assert inliers[:n_plane].mean() > 0.99
    assert inliers[n_plane:].mean() < 0.05


def test_segment_plane_respects_mask():
    pts, n_plane = _plane_plus_noise()
    # mask OUT the plane -> best plane must come from the noise block
    mask = np.ones(len(pts), bool)
    mask[:n_plane] = False
    plane, inliers = seg.segment_plane(
        jnp.asarray(pts), mask=jnp.asarray(mask), distance_threshold=0.05,
        num_iterations=64,
    )
    assert not np.asarray(inliers)[:n_plane].any()


def test_cluster_dbscan_two_blobs():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 0.05, (120, 3))
    b = rng.normal(0, 0.05, (150, 3)) + np.array([5.0, 0, 0])
    lone = np.array([[50.0, 50.0, 50.0]])
    pts = jnp.asarray(np.vstack([a, b, lone]).astype(np.float32))
    labels = np.asarray(seg.cluster_dbscan(pts, eps=0.5, min_points=5))
    assert labels[-1] == -1  # isolated point is noise
    la, lb = labels[:120], labels[120:270]
    assert len(set(la.tolist())) == 1 and len(set(lb.tolist())) == 1
    assert la[0] != lb[0]
    assert {la[0], lb[0]} == {0, 1}  # compacted consecutive ids
    assert la[0] == 0  # first-occurrence ordering


def test_cluster_dbscan_chain_merges():
    # a chain of points each within eps of the next must be ONE cluster
    # (transitive closure — catches one-hop-only propagation bugs)
    pts = jnp.asarray(
        np.column_stack(
            [np.linspace(0, 9.9, 100), np.zeros(100), np.zeros(100)]
        ).astype(np.float32)
    )
    labels = np.asarray(seg.cluster_dbscan(pts, eps=0.15, min_points=2))
    assert (labels == 0).all()


def test_iss_keypoints_on_corner():
    # a cube corner is salient; flat-plane interior points are not
    rng = np.random.default_rng(2)
    g = np.linspace(0, 1, 12)
    xx, yy = np.meshgrid(g, g)
    plane = np.column_stack([xx.ravel(), yy.ravel(), np.zeros(xx.size)])
    pts = jnp.asarray(plane.astype(np.float32))
    kp = np.asarray(
        seg.compute_iss_keypoints(
            pts, salient_radius=0.3, non_max_radius=0.2, min_neighbors=4
        )
    )
    # perfect plane: lambda3 ~ 0 and lambda2/lambda1 ~ 1 -> no keypoints
    assert kp.sum() <= 4


def test_convex_hull_cube():
    corners = np.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
        np.float32,
    )
    interior = np.random.default_rng(3).uniform(0.2, 0.8, (50, 3)).astype(np.float32)
    pts = np.vstack([corners, interior])
    verts, tris, ids = seg.compute_convex_hull(pts)
    assert len(verts) == 8
    assert sorted(ids.tolist()) == list(range(8))
    # hull area of unit cube = 6
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    assert abs(area - 6.0) < 1e-5


def test_hidden_point_removal_sphere():
    # points on a sphere viewed from +z: back hemisphere hidden
    rng = np.random.default_rng(4)
    v = rng.normal(size=(500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    vis = seg.hidden_point_removal(v, camera_location=[0, 0, 4.0], radius=100.0)
    zvis = v[vis][:, 2]
    assert (zvis > -0.2).mean() > 0.9  # mostly front-facing
    assert len(vis) < 450


def test_detect_planar_patches_two_planes():
    """(ref: PointCloud::DetectPlanarPatches,
    geometry/PointCloudPlanarPatchDetection.cpp)"""
    import numpy as np

    from open3d_tpu.geometry.pointcloud import PointCloud
    from open3d_tpu.ops import pointcloud as pc_ops
    from open3d_tpu.ops import segmentation as seg

    rng = np.random.default_rng(1)
    g = np.linspace(0, 1, 24, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    floor = np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size, np.float32)], -1)
    wall = np.stack([xx.ravel(), np.zeros(xx.size, np.float32) - 0.2, yy.ravel() + 0.2], -1)
    pts = np.concatenate([floor, wall]) + rng.normal(0, 0.002, (2 * xx.size, 3)).astype(np.float32)
    pcd = PointCloud.create(jnp.asarray(pts))
    pcd = pc_ops.estimate_normals(pcd, max_nn=12)
    labels, obbs, n_patches = seg.detect_planar_patches(
        pcd, distance_threshold=0.02, min_num_points=100, max_patches=8
    )
    labels = np.asarray(labels)
    assert int(n_patches) == 2
    # the two ground-truth planes map to two distinct labels
    lf = labels[: xx.size]
    lw = labels[xx.size:]
    assert (lf >= 0).mean() > 0.9 and (lw >= 0).mean() > 0.9
    assert np.median(lf) != np.median(lw)
    # patch OBBs are thin along the plane normal
    ext = np.asarray(obbs.extent)[:2]
    assert np.all(ext[:, 2] < 0.05) and np.all(ext[:, :2] > 0.5)
