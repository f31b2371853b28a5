"""Mesh toolbox op tests (subdivide / simplify / clip / dedup / smooth)."""

import jax.numpy as jnp
import numpy as np

from open3d_tpu.geometry.trianglemesh import TriangleMesh
from open3d_tpu.ops import mesh as mops


def _unit_quad():
    v = jnp.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], jnp.float32)
    t = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return TriangleMesh.create(v, t)


def test_subdivide_midpoint_counts_and_area():
    m = _unit_quad()
    area0 = float(m.surface_area())
    s = mops.subdivide_midpoint(m, 1)
    assert int(s.num_triangles()) == 8
    # shared edge midpoint deduplicated: 4 + 5 unique midpoints = 9 vertices
    assert int(s.num_vertices()) == 9
    np.testing.assert_allclose(float(s.surface_area()), area0, rtol=1e-6)


def test_simplify_vertex_clustering():
    m = mops.subdivide_midpoint(_unit_quad(), 2)  # 32 tris
    simp = mops.simplify_vertex_clustering(m, voxel_size=0.6)
    assert int(simp.num_vertices()) <= 6
    assert int(simp.num_triangles()) < int(m.num_triangles())
    # no degenerate triangles among the valid ones
    t = np.asarray(simp.triangles)[np.asarray(simp.triangle_mask)]
    assert (t[:, 0] != t[:, 1]).all() and (t[:, 1] != t[:, 2]).all()


def test_clip_plane():
    m = mops.subdivide_midpoint(_unit_quad(), 2)
    c = mops.clip_plane(m, point=[0.5, 0, 0], normal=[1, 0, 0])
    v = np.asarray(c.vertices)
    vm = np.asarray(c.vertex_mask)
    assert (v[vm][:, 0] >= 0.5 - 1e-6).all()
    assert 0 < int(c.num_triangles()) < int(m.num_triangles())


def test_remove_duplicated_vertices():
    v = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 0, 0]], jnp.float32
    )  # vertex 3 duplicates vertex 1
    t = jnp.asarray([[0, 1, 2], [0, 3, 2]], jnp.int32)
    m = TriangleMesh.create(v, t)
    d = mops.remove_duplicated_vertices(m)
    assert int(d.num_vertices()) == 3
    tt = np.asarray(d.triangles)
    assert set(tt[0].tolist()) == set(tt[1].tolist())  # same triangle now


def test_laplacian_and_taubin_smoothing():
    rng = np.random.default_rng(0)
    m = mops.subdivide_midpoint(_unit_quad(), 2)
    noisy_v = np.asarray(m.vertices).copy()
    noisy_v[:, 2] += rng.normal(0, 0.02, len(noisy_v))
    noisy = TriangleMesh.create(jnp.asarray(noisy_v), m.triangles,
                                vertex_mask=m.vertex_mask,
                                triangle_mask=m.triangle_mask)
    sm = mops.filter_smooth_laplacian(noisy, 5, 0.5)
    z0 = np.abs(np.asarray(noisy.vertices)[:, 2]).mean()
    z1 = np.abs(np.asarray(sm.vertices)[:, 2]).mean()
    assert z1 < z0  # roughness reduced
    tb = mops.filter_smooth_taubin(noisy, 5)
    # taubin preserves extent better than pure laplacian
    ext_t = np.ptp(np.asarray(tb.vertices)[:, 0])
    assert ext_t > 0.9


def test_subdivide_loop_smooths_toward_sphere():
    """(ref: TriangleMesh::SubdivideLoop, TriangleMeshSubdivide.cpp) —
    Loop subdivision of an octahedron converges toward a sphere: counts
    quadruple, surface stays closed, and the vertex-radius spread shrinks
    vs plain midpoint subdivision."""
    import numpy as np

    from open3d_tpu.geometry.trianglemesh import TriangleMesh
    from open3d_tpu.ops import mesh as mo

    v = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        jnp.float32,
    )
    t = jnp.asarray(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
        jnp.int32,
    )
    mesh = TriangleMesh.create(v, t)
    loop2 = mo.subdivide_loop(mesh, 2)
    mid2 = mo.subdivide_midpoint(mesh, 2)
    assert int(loop2.num_triangles()) == 8 * 16
    # closed surface: Euler characteristic 2 => V - E + F = 2 with E = 3F/2
    nv = int(loop2.num_vertices())
    nf = int(loop2.num_triangles())
    assert nv - (3 * nf) // 2 + nf == 2
    rl = np.linalg.norm(
        np.asarray(loop2.vertices)[np.asarray(loop2.vertex_mask)], axis=1
    )
    rm = np.linalg.norm(
        np.asarray(mid2.vertices)[np.asarray(mid2.vertex_mask)], axis=1
    )
    assert rl.std() / rl.mean() < 0.5 * (rm.std() / rm.mean())
    # smoothing shrinks strictly inside the original octahedron
    assert rl.max() < 1.0 + 1e-5
