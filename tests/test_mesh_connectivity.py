"""Connectivity cleanup family (ref: geometry/TriangleMesh.h:117,150,442):
cluster_connected_triangles / remove_small_components / merge_close_vertices
/ compute_adjacency_list on a multi-component test mesh."""

import jax.numpy as jnp
import numpy as np

from open3d_tpu.geometry.trianglemesh import TriangleMesh
from open3d_tpu.ops import mesh as mops


def _two_component_mesh():
    # component A: square (2 triangles, edge-adjacent); component B: one
    # far triangle; plus one masked-out triangle
    verts = jnp.asarray(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],      # square
            [10, 0, 0], [11, 0, 0], [10, 1, 0],               # lone triangle
            [20, 0, 0], [21, 0, 0], [20, 1, 0],               # masked
        ],
        jnp.float32,
    )
    tris = jnp.asarray(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [7, 8, 9]], jnp.int32
    )
    tmask = jnp.asarray([True, True, True, False])
    return TriangleMesh.create(verts, tris, triangle_mask=tmask)


def test_cluster_connected_triangles():
    mesh = _two_component_mesh()
    ids, n, counts, areas = mops.cluster_connected_triangles(mesh)
    ids = np.asarray(ids)
    assert int(n) == 2
    assert ids[0] == ids[1] == 0          # square = cluster 0
    assert ids[2] == 1                     # lone triangle = cluster 1
    assert ids[3] == -1                    # masked out
    counts = np.asarray(counts)
    assert counts[0] == counts[1] == 2 and counts[2] == 1
    areas = np.asarray(areas)
    np.testing.assert_allclose(areas[0], 1.0, atol=1e-6)   # unit square
    np.testing.assert_allclose(areas[2], 0.5, atol=1e-6)


def test_cluster_vertex_touching_stays_separate():
    # two triangles sharing only a VERTEX are separate clusters (edge-based
    # connectivity, matching the reference's edge map BFS)
    verts = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0]], jnp.float32
    )
    tris = jnp.asarray([[0, 1, 2], [0, 3, 4]], jnp.int32)
    mesh = TriangleMesh.create(verts, tris)
    _, n, _, _ = mops.cluster_connected_triangles(mesh)
    assert int(n) == 2


def test_remove_small_components():
    mesh = _two_component_mesh()
    out = mops.remove_small_components(mesh, min_triangles=2)
    tm = np.asarray(out.triangle_mask)
    assert tm.tolist() == [True, True, False, False]
    out2 = mops.remove_small_components(mesh, min_area=0.9)
    assert np.asarray(out2.triangle_mask).tolist() == [True, True, False, False]


def test_merge_close_vertices():
    # duplicate square corners offset by 1e-4; merging at eps=1e-2 must
    # fuse them and keep both triangles valid
    verts = jnp.asarray(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0],
            [0, 0, 1e-4], [1 + 1e-4, 1, 0], [0, 1, 0],
        ],
        jnp.float32,
    )
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    mesh = TriangleMesh.create(verts, tris)
    out = mops.merge_close_vertices(mesh, eps=1e-2)
    vm = np.asarray(out.vertex_mask)
    assert vm.sum() == 4  # 6 -> 4 distinct corners
    tri = np.asarray(out.triangles)
    assert np.asarray(out.triangle_mask).all()
    # both triangles now reference the SAME merged corner ids
    assert tri[1, 0] == tri[0, 0] and tri[1, 1] == tri[0, 2]
    # degenerate collapse: a sliver triangle whose corners all merge
    sliver = TriangleMesh.create(
        jnp.asarray([[0, 0, 0], [1e-5, 0, 0], [0, 1e-5, 0]], jnp.float32),
        jnp.asarray([[0, 1, 2]], jnp.int32),
    )
    out2 = mops.merge_close_vertices(sliver, eps=1e-2)
    assert not bool(out2.triangle_mask[0])


def test_compute_adjacency_list():
    mesh = _two_component_mesh()
    adj, deg = mops.compute_adjacency_list(mesh, max_degree=8)
    adj = np.asarray(adj)
    deg = np.asarray(deg)
    # vertex 0 neighbors in the square: 1, 2, 3
    assert deg[0] == 3
    assert set(adj[0, :3].tolist()) == {1, 2, 3}
    # lone triangle vertex 4: neighbors 5, 6
    assert deg[4] == 2 and set(adj[4, :2].tolist()) == {5, 6}
    # masked triangle contributes nothing
    assert deg[7] == 0
