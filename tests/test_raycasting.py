"""RaycastingScene tests: rays / closest points / signed distance on meshes
with analytically known answers (ref test style:
cpp/tests/t/geometry/RaycastingScene.cpp)."""

import jax.numpy as jnp
import numpy as np

from open3d_tpu.geometry import raycasting as rc


def _unit_cube():
    # 8 vertices, 12 triangles, outward-wound, centered at origin
    v = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)],
        np.float32,
    )
    f = np.array(
        [
            [0, 1, 3], [0, 3, 2],  # x = -0.5
            [4, 6, 7], [4, 7, 5],  # x = +0.5
            [0, 4, 5], [0, 5, 1],  # y = -0.5
            [2, 3, 7], [2, 7, 6],  # y = +0.5
            [0, 2, 6], [0, 6, 4],  # z = -0.5
            [1, 5, 7], [1, 7, 3],  # z = +0.5
        ],
        np.int32,
    )
    return v, f


def _scene():
    s = rc.RaycastingScene(tile=8)
    v, f = _unit_cube()
    s.add_triangles(v, f)
    return s


def test_cast_rays_hit_and_miss():
    s = _scene()
    rays = jnp.asarray(
        [
            [0, 0, -5, 0, 0, 1],   # hits z=-0.5 face at t=4.5
            [0, 0, -5, 0, 0, -1],  # points away -> miss
            [5, 5, 5, 0, 0, 1],    # offset -> miss
        ],
        jnp.float32,
    )
    out = s.cast_rays(rays)
    t = np.asarray(out["t_hit"])
    assert abs(t[0] - 4.5) < 1e-4
    assert np.isinf(t[1]) and np.isinf(t[2])
    assert np.asarray(out["geometry_ids"])[0] == 0
    assert np.asarray(out["geometry_ids"])[1] == -1
    n = np.asarray(out["primitive_normals"])[0]
    assert abs(abs(n[2]) - 1.0) < 1e-5


def test_count_intersections_parity():
    s = _scene()
    # offset from face-diagonal symmetry so each face is crossed in exactly
    # one triangle's interior
    inside = jnp.asarray([[0.03, 0.07, 0.01, 1, 0.11, 0.05]], jnp.float32)
    outside = jnp.asarray([[0.03, 0.07, -5, 0.011, 0.007, 1]], jnp.float32)
    assert int(s.count_intersections(inside)[0]) == 1
    assert int(s.count_intersections(outside)[0]) == 2


def test_closest_points_and_distance():
    s = _scene()
    q = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 0.0], [1.5, 0.0, 0.0]])
    out = s.compute_closest_points(q)
    cp = np.asarray(out["points"])
    np.testing.assert_allclose(cp[0], [0, 0, 0.5], atol=1e-5)
    np.testing.assert_allclose(cp[2], [0.5, 0, 0], atol=1e-5)
    d = np.asarray(s.compute_distance(q))
    np.testing.assert_allclose(d, [1.5, 0.5, 1.0], atol=1e-5)


def test_signed_distance_and_occupancy():
    s = _scene()
    q = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0], [0.3, 0.3, 0.3]])
    occ = np.asarray(s.compute_occupancy(q))
    np.testing.assert_allclose(occ, [1.0, 0.0, 1.0])
    sd = np.asarray(s.compute_signed_distance(q))
    assert abs(sd[0] + 0.5) < 1e-5
    assert abs(sd[1] - 1.5) < 1e-5
    assert sd[2] < 0


def test_create_rays_pinhole_center_ray():
    from open3d_tpu.geometry.camera import PinholeCameraIntrinsic

    intr = PinholeCameraIntrinsic(64, 48, 50.0, 50.0, 31.5, 23.5)
    rays = rc.create_rays_pinhole(intr, jnp.eye(4), 64, 48)
    assert rays.shape == (48, 64, 6)
    center = np.asarray(rays[24, 32])
    np.testing.assert_allclose(center[:3], 0.0, atol=1e-6)
    d = center[3:]
    # center pixel (32+0.5, 24+0.5) vs principal point (31.5, 23.5) -> +z-ish
    assert d[2] > 0.99 * np.linalg.norm(d)


def test_two_geometries_ids():
    s = rc.RaycastingScene(tile=8)
    v, f = _unit_cube()
    s.add_triangles(v, f)
    s.add_triangles(v + np.array([3.0, 0, 0], np.float32), f)
    rays = jnp.asarray([[3.0, 0, -5, 0, 0, 1], [0.0, 0, -5, 0, 0, 1]], jnp.float32)
    out = s.cast_rays(rays)
    gids = np.asarray(out["geometry_ids"])
    assert gids[0] == 1 and gids[1] == 0
