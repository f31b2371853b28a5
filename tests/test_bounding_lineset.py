"""AABB / OBB / minimal OBB / LineSet behavior tests.

Mirrors reference tests cpp/tests/t/geometry/BoundingVolume.cpp and
LineSet.cpp: creation from points, volume/corners, membership, minimal OBB
beating the PCA OBB on a rotated box, and wireframe conversion.
"""

import jax.numpy as jnp
import numpy as np

from open3d_tpu.geometry import (
    AxisAlignedBoundingBox,
    LineSet,
    OrientedBoundingBox,
)
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic


def _rot(axis, deg):
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    if axis == 2:
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)


def _box_cloud(ext=(2.0, 1.0, 0.5), n=2000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-0.5, 0.5, (n, 3)) * np.asarray(ext)).astype(np.float32)


def test_aabb_from_points():
    pts = _box_cloud()
    aabb = AxisAlignedBoundingBox.create_from_points(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(aabb.get_extent()), [2, 1, 0.5], atol=0.05)
    assert abs(float(aabb.volume()) - 1.0) < 0.1
    assert np.asarray(aabb.contains(jnp.zeros((1, 3)))).all()
    assert not np.asarray(aabb.contains(jnp.full((1, 3), 5.0))).any()
    corners = np.asarray(aabb.get_box_points())
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.min(0), np.asarray(aabb.min_bound))
    np.testing.assert_allclose(corners.max(0), np.asarray(aabb.max_bound))


def test_aabb_masked():
    pts = np.concatenate([_box_cloud(), np.full((10, 3), 100.0, np.float32)])
    mask = jnp.asarray(np.arange(2010) < 2000)
    aabb = AxisAlignedBoundingBox.create_from_points(jnp.asarray(pts), mask)
    assert float(aabb.get_max_extent()) < 3.0


def test_obb_pca_recovers_rotation():
    R = _rot(2, 30)
    pts = _box_cloud() @ R.T + np.asarray([1.0, 2.0, 3.0], np.float32)
    obb = OrientedBoundingBox.create_from_points(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(obb.center), [1, 2, 3], atol=0.05)
    ext = np.sort(np.asarray(obb.extent))
    np.testing.assert_allclose(ext, [0.5, 1.0, 2.0], atol=0.05)
    assert np.asarray(obb.contains(jnp.asarray(pts))).mean() > 0.999
    # volume ~ true box volume, much tighter than the world AABB
    aabb = AxisAlignedBoundingBox.create_from_points(jnp.asarray(pts))
    assert float(obb.volume()) < float(aabb.volume()) * 0.9


def test_minimal_obb_beats_pca():
    # L-shaped cloud: PCA axes are NOT the minimal box axes
    rng = np.random.default_rng(1)
    a = rng.uniform([0, 0, 0], [4, 1, 1], (1500, 3))
    b = rng.uniform([0, 0, 0], [1, 4, 1], (1500, 3))
    pts = np.concatenate([a, b]).astype(np.float32)
    R = _rot(2, 25) @ _rot(0, 10)
    pts = pts @ R.T
    mini = OrientedBoundingBox.create_minimal(jnp.asarray(pts))
    pca = OrientedBoundingBox.create_from_points(jnp.asarray(pts))
    assert np.asarray(mini.contains(jnp.asarray(pts))).mean() > 0.999
    assert float(mini.volume()) <= float(pca.volume()) + 1e-5
    # the minimal box must rediscover the 4x4x1 axis-aligned-in-object frame
    assert float(mini.volume()) < 17.0  # true hull box is 16


def test_obb_transform_roundtrip():
    pts = _box_cloud()
    obb = OrientedBoundingBox.create_from_points(jnp.asarray(pts))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = _rot(0, 45)
    T[:3, 3] = [0.5, -1.0, 2.0]
    moved = obb.transform(jnp.asarray(T))
    pts_t = pts @ T[:3, :3].T + T[:3, 3]
    assert np.asarray(moved.contains(jnp.asarray(pts_t))).mean() > 0.999
    np.testing.assert_allclose(float(moved.volume()), float(obb.volume()), rtol=1e-5)


def test_lineset_basics():
    pts = jnp.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0]], jnp.float32)
    lines = jnp.asarray([[0, 1], [1, 2]], jnp.int32)
    ls = LineSet.create(pts, lines, line_attrs={"colors": jnp.ones((2, 3))})
    assert int(ls.num_points()) == 3 and int(ls.num_lines()) == 2
    np.testing.assert_allclose(np.asarray(ls.line_lengths()), [1.0, 1.0])
    moved = ls.translate(jnp.asarray([1.0, 0, 0]))
    np.testing.assert_allclose(np.asarray(moved.get_min_bound()), [1, 0, 0])
    T = jnp.asarray(np.diag([1, 1, 1, 1]).astype(np.float32))
    same = ls.transform(T)
    p, l = same.to_numpy()
    assert p.shape == (3, 3) and l.shape == (2, 2)


def test_lineset_from_boxes_and_camera():
    aabb = AxisAlignedBoundingBox(
        min_bound=jnp.zeros(3), max_bound=jnp.ones(3)
    )
    wf = LineSet.from_bounding_box(aabb)
    assert int(wf.num_points()) == 8 and int(wf.num_lines()) == 12
    np.testing.assert_allclose(np.asarray(wf.line_lengths()), np.ones(12))

    intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
    cam = LineSet.create_camera_visualization(intr, jnp.eye(4), scale=0.2)
    assert int(cam.num_points()) == 5 and int(cam.num_lines()) == 8
    p, _ = cam.to_numpy()
    np.testing.assert_allclose(p[0], [0, 0, 0], atol=1e-6)  # apex at origin
    np.testing.assert_allclose(p[1:, 2], 0.2, atol=1e-6)  # corners at depth
