"""VoxelGrid + linear Octree tests."""

import jax.numpy as jnp
import numpy as np

from open3d_tpu.geometry import voxelgrid as vg


def test_create_from_point_cloud_dedup_and_color():
    pts = jnp.asarray([[0.1, 0.1, 0.1], [0.2, 0.1, 0.1], [1.1, 0.1, 0.1]], jnp.float32)
    cols = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    grid = vg.create_from_point_cloud(pts, 1.0, colors=cols, origin=[0, 0, 0])
    assert int(grid.num_voxels) == 2
    valid = np.asarray(grid.valid)
    coords = np.asarray(grid.coords)[valid]
    assert {tuple(r) for r in coords.tolist()} == {(0, 0, 0), (1, 0, 0)}
    cols_out = np.asarray(grid.colors)[valid]
    row0 = int(np.nonzero((coords == [0, 0, 0]).all(1))[0][0])
    np.testing.assert_allclose(cols_out[row0], [0.5, 0.5, 0.0], atol=1e-6)


def test_check_if_included():
    pts = jnp.asarray([[0.5, 0.5, 0.5], [3.5, 0.5, 0.5]], jnp.float32)
    grid = vg.create_from_point_cloud(pts, 1.0, origin=[0, 0, 0])
    q = jnp.asarray([[0.7, 0.7, 0.7], [3.2, 0.2, 0.2], [2.5, 0.5, 0.5]], jnp.float32)
    inc = np.asarray(grid.check_if_included(q))
    np.testing.assert_array_equal(inc, [True, True, False])


def test_create_dense_and_carve():
    from open3d_tpu.geometry.camera import PinholeCameraIntrinsic

    grid = vg.create_dense([0, 0, 0], [0.5, 0.5, 0.5], 0.5, 2.0, 2.0, 2.0)
    assert int(grid.num_voxels) == 4 * 4 * 4
    # camera at z=-2 looking +z; a wall at depth 2.75 (z=0.75 in world);
    # voxels with center z < wall depth along the ray are carved
    intr = PinholeCameraIntrinsic(64, 48, 40.0, 40.0, 31.5, 23.5)
    E = jnp.asarray(
        [[1, 0, 0, -1.0], [0, 1, 0, -1.0], [0, 0, 1, 2.0], [0, 0, 0, 1]],
        jnp.float32,
    )  # world->camera: camera center at (1,1,-2) world
    depth = jnp.full((48, 64), 2.75, jnp.float32)
    carved = vg.carve_depth_map(grid, depth, intr, E)
    n_after = int(carved.num_voxels)
    assert n_after < 64
    centers = np.asarray(carved.get_voxel_centers())[np.asarray(carved.valid)]
    # every surviving in-frustum voxel center has camera depth >= 2.75-ish
    assert (centers[:, 2] > 0.5).all()


def test_octree_build_and_locate():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 1, (256, 3)).astype(np.float32))
    tree = vg.octree_from_point_cloud(pts, max_depth=4)
    counts = [int(c) for c in tree.level_counts]
    assert counts[0] <= 8
    assert all(a <= b for a, b in zip(counts, counts[1:]))  # monotone growth
    # locating the input points must land in occupied leaves
    leaf = np.asarray(tree.locate_leaf(pts))
    assert (leaf >= 0).all()
    # a far query point is in no leaf
    far = jnp.asarray([[10.0, 10.0, 10.0]])
    assert int(tree.locate_leaf(far)[0]) == -1


def test_octree_respects_mask():
    pts = jnp.asarray(
        [[0.1, 0.1, 0.1], [0.9, 0.9, 0.9], [0.5, 0.5, 0.5]], jnp.float32
    )
    mask = jnp.asarray([True, True, False])
    tree = vg.octree_from_point_cloud(pts, max_depth=2, mask=mask)
    assert int(tree.locate_leaf(pts[2:3])[0]) == -1
