"""TriangleMesh + marching-tetrahedra extraction + metrics tests.

(ref test model: cpp/tests/t/geometry/TriangleMesh.cpp and
VoxelBlockGrid.cpp — extraction validated against the analytic scene SDF
via Chamfer/F-score, exactly how SURVEY.md section 7.5 prescribes.)"""

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.data import synthetic
from open3d_tpu.geometry import trianglemesh as tm
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.geometry.pointcloud import PointCloud


def _unit_quad():
    """Two triangles covering the unit square in z=0."""
    v = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], jnp.float32
    )
    t = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return tm.TriangleMesh.create(v, t)


class TestTriangleMesh:
    def test_surface_area_and_normals(self):
        mesh = _unit_quad().compute_triangle_normals().compute_vertex_normals()
        assert abs(float(mesh.surface_area()) - 1.0) < 1e-6
        tn = mesh.triangle_attrs["normals"]
        np.testing.assert_allclose(np.abs(np.asarray(tn[:, 2])), 1.0, atol=1e-6)
        vn = mesh.vertex_attrs["normals"]
        np.testing.assert_allclose(np.abs(np.asarray(vn[:, 2])), 1.0, atol=1e-6)

    def test_sample_points_uniformly(self):
        mesh = _unit_quad()
        pcd = mesh.sample_points_uniformly(2000, key=jax.random.PRNGKey(1))
        p = np.asarray(pcd.positions)
        assert p.shape == (2000, 3)
        assert np.all(p[:, :2] >= -1e-6) and np.all(p[:, :2] <= 1 + 1e-6)
        assert np.allclose(p[:, 2], 0.0, atol=1e-6)
        # roughly uniform: mean near centroid
        assert np.allclose(p[:, :2].mean(0), 0.5, atol=0.05)

    def test_metrics_identical_meshes(self):
        mesh = _unit_quad()
        m = tm.compute_metrics_mesh(mesh, mesh, n_samples=2000, fscore_radius=0.05)
        assert float(m.chamfer_distance) < 0.05
        assert float(m.fscore) > 0.99

    def test_metrics_offset_detects_distance(self):
        a = _unit_quad()
        b = _unit_quad().transform(jnp.eye(4).at[2, 3].set(0.5))
        m = tm.compute_metrics_mesh(a, b, n_samples=2000, fscore_radius=0.05)
        assert float(m.chamfer_distance) > 0.8  # ~2 x 0.5 offset
        assert float(m.fscore) < 0.01

    def test_compact_merges_soup(self):
        soup = jnp.asarray(
            [
                [[0, 0, 0], [1, 0, 0], [1, 1, 0]],
                [[0, 0, 0], [1, 1, 0], [0, 1, 0]],
            ],
            jnp.float32,
        )
        mesh = tm.TriangleMesh.from_triangle_soup(soup, jnp.ones((2,), bool))
        v, t = mesh.compact()
        assert v.shape[0] == 4  # 6 soup vertices -> 4 unique
        assert t.shape == (2, 3)


class TestExtractTriangleMesh:
    def test_sphere_extraction(self):
        """Integrate a synthetic scan and check the mesh against the scene."""
        intr = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
        depths, colors, extrinsics, _ = synthetic.render_sequence(
            6, intrinsic=intr, span=0.6
        )
        vbg = vbg_mod.create(
            voxel_size=0.02, block_resolution=8, block_count=4096, with_color=True
        )

        @jax.jit
        def step(vbg, depth, color, extrinsic):
            keys, _ = vbg_mod.compute_unique_block_coordinates(
                vbg, depth, intr, extrinsic, depth_max=4.0, frame_block_capacity=2048
            )
            return vbg_mod.integrate(vbg, keys, depth, color, intr, extrinsic, depth_max=4.0)

        for i in range(6):
            vbg = step(vbg, depths[i], colors[i], extrinsics[i])

        mesh = vbg_mod.extract_triangle_mesh(vbg, triangle_capacity=262144, weight_threshold=2.0)
        n_tri = int(mesh.num_triangles())
        assert n_tri > 1000

        # mesh samples must lie near the TSDF zero crossing of the point cloud
        pcd = vbg_mod.extract_point_cloud(vbg, point_capacity=131072, weight_threshold=2.0)
        samples = mesh.sample_points_uniformly(5000, key=jax.random.PRNGKey(0))
        m = tm.compute_metrics_point_cloud(samples, pcd, fscore_radius=0.03)
        assert float(m.chamfer_distance) < 0.05
        assert float(m.fscore) > 0.9

    def test_indexed_extraction_shares_vertices(self):
        """VERDICT r4 item 4: extraction emits shared-vertex topology (no 6x
        soup duplication), identical surface to the soup path, and feeds
        downstream mesh ops that need real topology."""
        intr = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
        depths, colors, extrinsics, _ = synthetic.render_sequence(
            4, intrinsic=intr, span=0.4
        )
        vbg = vbg_mod.create(
            voxel_size=0.02, block_resolution=8, block_count=4096, with_color=True
        )

        @jax.jit
        def step(vbg, depth, color, extrinsic):
            keys, _ = vbg_mod.compute_unique_block_coordinates(
                vbg, depth, intr, extrinsic, depth_max=4.0, frame_block_capacity=2048
            )
            return vbg_mod.integrate(vbg, keys, depth, color, intr, extrinsic, depth_max=4.0)

        for i in range(4):
            vbg = step(vbg, depths[i], colors[i], extrinsics[i])

        mesh = vbg_mod.extract_triangle_mesh(
            vbg, triangle_capacity=131072, weight_threshold=2.0
        )
        soup = vbg_mod.extract_triangle_mesh(
            vbg, triangle_capacity=131072, weight_threshold=2.0, indexed=False
        )
        n_tri = int(mesh.num_triangles())
        n_v = int(mesh.num_vertices())
        assert n_tri == int(soup.num_triangles()) > 500
        # shared topology: well under half the 3T soup vertices survive
        assert n_v < 1.5 * n_tri
        # triangle indices reference live vertices and reproduce the soup
        tris = np.asarray(mesh.triangles)[np.asarray(mesh.triangle_mask)]
        assert tris.min() >= 0 and tris.max() < n_v
        mv = np.asarray(mesh.vertices)
        sv = np.asarray(soup.vertices).reshape(-1, 3, 3)[
            np.asarray(soup.triangle_mask)
        ]
        np.testing.assert_allclose(mv[tris], sv, atol=0)
        # colors carried per unique vertex
        assert mesh.vertex_attrs["colors"].shape == mesh.vertices.shape
        # real topology round-trips through quadric decimation
        from open3d_tpu.ops import mesh as mops

        dec = mops.simplify_quadric_decimation(mesh, target_number_of_triangles=n_tri // 4)
        assert int(dec.num_triangles()) <= n_tri // 2
        m = tm.compute_metrics_mesh(dec, mesh, n_samples=4000, fscore_radius=0.04)
        assert float(m.fscore) > 0.85

    def test_capacity_overflow_is_masked(self):
        intr = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
        depths, colors, extrinsics, _ = synthetic.render_sequence(2, intrinsic=intr)
        vbg = vbg_mod.create(voxel_size=0.02, block_resolution=8, block_count=2048)
        keys, _ = vbg_mod.compute_unique_block_coordinates(
            vbg, depths[0], intr, extrinsics[0], depth_max=4.0, frame_block_capacity=1024
        )
        vbg = vbg_mod.integrate(vbg, keys, depths[0], colors[0], intr, extrinsics[0], depth_max=4.0)
        mesh = vbg_mod.extract_triangle_mesh(vbg, triangle_capacity=64, weight_threshold=0.5)
        assert int(mesh.num_triangles()) <= 64


def test_sample_points_poisson_disk_spacing():
    """(ref: TriangleMesh::SamplePointsPoissonDisk) — the eliminated set
    must be better spaced than a uniform sample of the same size."""
    mesh = _unit_quad()
    n = 100
    pd = mesh.sample_points_poisson_disk(n, key=jax.random.PRNGKey(0))
    un = mesh.sample_points_uniformly(n, key=jax.random.PRNGKey(0))

    def min_nn_dist(pcd):
        p = np.asarray(pcd.positions)[np.asarray(pcd.mask)]
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min(axis=1)

    dpd = min_nn_dist(pd)
    dun = min_nn_dist(un)
    assert int(pd.count()) == n
    # Poisson-disk property: larger minimum spacing, tighter distribution
    assert dpd.min() > 2.0 * dun.min()
    assert dpd.mean() > dun.mean()
