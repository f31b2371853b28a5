"""Morton BVH vs the brute-force tiled sweep (the reference implementation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.geometry import bvh as bvh_mod
from open3d_tpu.geometry.raycasting import RaycastingScene, create_rays_pinhole


def _sphere_mesh(n_theta=48, n_phi=96, r=1.0):
    th = np.linspace(1e-3, np.pi - 1e-3, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack(
        [r * np.sin(T) * np.cos(P), r * np.sin(T) * np.sin(P), r * np.cos(T)], -1
    ).reshape(-1, 3)
    tris = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            tris.append([a, b, c])
            tris.append([b, d, c])
    return pts.astype(np.float32), np.asarray(tris, np.int32)


@pytest.fixture(scope="module")
def sphere():
    return _sphere_mesh()


class TestBVHCastRays:
    def test_matches_bruteforce(self, sphere):
        v, t = sphere  # 9k triangles
        rng = np.random.default_rng(0)
        origins = np.tile([[0.0, 0.0, 3.0]], (64, 1)).astype(np.float32)
        dirs = np.concatenate(
            [rng.normal(0, 0.25, (64, 2)), -np.ones((64, 1))], -1
        ).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        bvh = bvh_mod.build_bvh(jnp.asarray(v), jnp.asarray(t))
        tb, ib, uv = bvh_mod.cast_rays(bvh, jnp.asarray(origins), jnp.asarray(dirs))

        scene = RaycastingScene(bvh_threshold=1 << 30)  # force brute force
        scene.add_triangles(v, t)
        res = scene.cast_rays(jnp.concatenate([origins, dirs], -1))

        t_ref = np.asarray(res["t_hit"])
        t_bvh = np.asarray(tb)
        hit_ref = np.isfinite(t_ref)
        hit_bvh = t_bvh < 1e30
        np.testing.assert_array_equal(hit_bvh, hit_ref)
        np.testing.assert_allclose(t_bvh[hit_bvh], t_ref[hit_ref], rtol=1e-4)

    def test_scene_routes_through_bvh(self, sphere):
        v, t = sphere
        scene = RaycastingScene(bvh_threshold=1)  # force BVH
        scene.add_triangles(v, t)
        # slight x-offset: the lat-long sphere has a pinhole at the exact pole
        rays = jnp.asarray(
            [[0.1, 0, 3, 0, 0, -1], [0, 0, 3, 0, 0, 1]], jnp.float32
        )
        res = scene.cast_rays(rays)
        tt = np.asarray(res["t_hit"])
        expect = 3.0 - np.sqrt(1.0 - 0.01)
        assert abs(tt[0] - expect) < 1e-2  # hits the unit sphere
        assert np.isinf(tt[1])
        assert int(res["geometry_ids"][0]) == 0 and int(res["geometry_ids"][1]) == -1


class TestBVHClosestPoints:
    def test_matches_bruteforce(self, sphere):
        v, t = sphere
        rng = np.random.default_rng(1)
        q = rng.uniform(-1.6, 1.6, (48, 3)).astype(np.float32)

        bvh = bvh_mod.build_bvh(jnp.asarray(v), jnp.asarray(t))
        bp, bi, dist = bvh_mod.closest_points(bvh, jnp.asarray(q))

        scene = RaycastingScene(bvh_threshold=1 << 30)
        scene.add_triangles(v, t)
        ref = scene.compute_closest_points(jnp.asarray(q))
        d_ref = np.sqrt(np.asarray(ref["distance2"]))
        np.testing.assert_allclose(np.asarray(dist), d_ref, atol=2e-4)

    def test_sphere_distance_analytic(self, sphere):
        v, t = sphere
        bvh = bvh_mod.build_bvh(jnp.asarray(v), jnp.asarray(t))
        q = jnp.asarray([[0.0, 0.0, 0.5], [0.0, 0.0, 2.0]], jnp.float32)
        _, _, dist = bvh_mod.closest_points(bvh, q)
        np.testing.assert_allclose(np.asarray(dist), [0.5, 1.0], atol=5e-3)
