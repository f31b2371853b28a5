"""Quadric decimation / selection / cleanup / hole filling tests.

Mirrors reference coverage: cpp/tests/geometry/TriangleMesh.cpp
(SimplifyQuadricDecimation, SelectByIndex, RemoveDegenerateTriangles) and
t/geometry FillHoles behavior.
"""

import jax.numpy as jnp
import numpy as np

from open3d_tpu.geometry.trianglemesh import TriangleMesh
from open3d_tpu.ops import mesh as mo


def _icosphere(subdiv=3, radius=1.0):
    """Host-built icosphere (test fixture only)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdiv):
        cache = {}
        new_faces = []
        verts = list(map(np.asarray, verts))

        def mid(i, j):
            k = (min(i, j), max(i, j))
            if k not in cache:
                cache[k] = len(verts)
                verts.append((verts[i] + verts[j]) / 2.0)
            return cache[k]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.asarray(new_faces, np.int64)
        verts = np.stack(verts)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius
    return TriangleMesh.create(verts.astype(np.float32), faces.astype(np.int32))


def test_quadric_decimation_sphere():
    mesh = _icosphere(3)  # 1280 triangles
    n0 = int(mesh.num_triangles())
    out = mo.simplify_quadric_decimation(mesh, n0 // 4)
    n1 = int(out.num_triangles())
    assert n0 // 4 <= n1 <= int(n0 * 0.45), n1  # converged near the target
    # surface stays on the unit sphere
    vm = np.asarray(out.vertex_mask)
    r = np.linalg.norm(np.asarray(out.vertices)[vm], axis=1)
    assert np.abs(r - 1.0).max() < 0.05
    # all live triangles reference live vertices
    t = np.asarray(out.triangles)[np.asarray(out.triangle_mask)]
    assert vm[t].all()


def test_quadric_decimation_preserves_planes():
    # a flat grid decimates with ~zero geometric error
    n = 12
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], -1).astype(np.float32)
    tris = []
    for y in range(n - 1):
        for x in range(n - 1):
            i = y * n + x
            tris += [[i, i + 1, i + n], [i + 1, i + n + 1, i + n]]
    mesh = TriangleMesh.create(verts, np.asarray(tris, np.int32))
    out = mo.simplify_quadric_decimation(mesh, 60)
    vm = np.asarray(out.vertex_mask)
    assert np.abs(np.asarray(out.vertices)[vm][:, 2]).max() < 1e-4
    assert int(out.num_triangles()) <= 130


def test_select_by_index_and_mask():
    mesh = _icosphere(1)
    V = mesh.vertices.shape[0]
    # keep the +z hemisphere
    keep = np.asarray(mesh.vertices)[:, 2] > 0
    out = mo.select_by_mask(mesh, jnp.asarray(keep))
    t = np.asarray(out.triangles)[np.asarray(out.triangle_mask)]
    assert keep[t].all()
    assert 0 < int(out.num_triangles()) < int(mesh.num_triangles())
    out2 = mo.select_by_index(mesh, np.nonzero(keep)[0])
    assert int(out2.num_triangles()) == int(out.num_triangles())


def test_remove_degenerate_and_unreferenced():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]], np.float32
    )  # vertex 3 unreferenced
    tris = np.array([[0, 1, 2], [0, 0, 1], [1, 1, 1]], np.int32)
    mesh = TriangleMesh.create(verts, tris)
    out = mo.remove_degenerate_triangles(mesh)
    assert int(out.num_triangles()) == 1
    out = mo.remove_unreferenced_vertices(out)
    assert int(out.num_vertices()) == 3
    assert not bool(out.vertex_mask[3])


def _boundary_edge_count(mesh):
    t = np.asarray(mesh.triangles)[np.asarray(mesh.triangle_mask)]
    e = np.sort(np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]]), axis=1)
    uniq, cnt = np.unique(e, axis=0, return_counts=True)
    return int((cnt == 1).sum())


def test_fill_holes_closes_cap():
    mesh = _icosphere(2)
    # cut a cap: drop triangles whose centroid z > 0.8
    t = np.asarray(mesh.triangles)
    cz = np.asarray(mesh.vertices)[t].mean(1)[:, 2]
    tmask = jnp.asarray(cz <= 0.8)
    holed = TriangleMesh.create(
        mesh.vertices, mesh.triangles, vertex_mask=mesh.vertex_mask,
        triangle_mask=tmask,
    )
    nb = _boundary_edge_count(holed)
    assert nb > 3  # the cut produced a boundary loop
    filled = mo.fill_holes(holed)
    assert _boundary_edge_count(filled) == 0
    assert int(filled.num_triangles()) > int(holed.num_triangles())


def test_fill_holes_respects_size_cutoff():
    mesh = _icosphere(2)
    t = np.asarray(mesh.triangles)
    cz = np.asarray(mesh.vertices)[t].mean(1)[:, 2]
    holed = TriangleMesh.create(
        mesh.vertices, mesh.triangles, triangle_mask=jnp.asarray(cz <= 0.8)
    )
    filled = mo.fill_holes(holed, hole_size=3)  # loop is longer than 3
    assert _boundary_edge_count(filled) == _boundary_edge_count(holed)


class TestARAP:
    """(ref: geometry/TriangleMeshDeformation.cpp DeformAsRigidAsPossible)"""

    def _grid_mesh(self, n=9, extent=1.0):
        xs = np.linspace(0, extent, n)
        X, Y = np.meshgrid(xs, xs)
        verts = np.stack([X.ravel(), Y.ravel(), np.zeros(n * n)], -1).astype(np.float32)
        tris = []
        for i in range(n - 1):
            for j in range(n - 1):
                a = i * n + j
                tris.append([a, a + 1, a + n])
                tris.append([a + 1, a + n + 1, a + n])
        return TriangleMesh.create(verts, np.asarray(tris, np.int32))

    def test_arap_lifts_handle_smoothly(self):
        n = 9
        mesh = self._grid_mesh(n)
        # pin the four corners, lift the center
        corners = [0, n - 1, n * (n - 1), n * n - 1]
        center = (n // 2) * n + n // 2
        cid = np.asarray(corners + [center], np.int32)
        cpos = np.asarray(mesh.vertices)[cid].copy()
        cpos[-1, 2] = 0.3
        out = mo.deform_as_rigid_as_possible(mesh, cid, cpos, max_iter=8)
        v = np.asarray(out.vertices)
        # constraints met exactly
        np.testing.assert_allclose(v[cid], cpos, atol=1e-5)
        # center lifted, neighbors follow smoothly (between 0 and the peak)
        mid_edge = (n // 2) * n + n // 2 - 1
        assert 0.03 < v[mid_edge, 2] < 0.3
        # far corners' neighbors barely move
        assert abs(v[1, 2]) < 0.1
        # no NaNs / explosions
        assert np.isfinite(v).all() and np.abs(v).max() < 2.0

    def test_arap_rigid_motion_is_free(self):
        # translating ALL constraints translates the whole mesh (residual ~0)
        mesh = self._grid_mesh(5)
        cid = np.asarray([0, 4, 20, 24], np.int32)
        shift = np.asarray([0.2, -0.1, 0.4], np.float32)
        cpos = np.asarray(mesh.vertices)[cid] + shift
        out = mo.deform_as_rigid_as_possible(mesh, cid, cpos, max_iter=12)
        v = np.asarray(out.vertices)
        np.testing.assert_allclose(
            v, np.asarray(mesh.vertices) + shift, atol=2e-2
        )


class TestBooleans:
    """SDF-composite booleans (ref: TriangleMesh::BooleanUnion/
    Intersection/Difference via VTK; TPU redesign = Ricci SDF combine)."""

    def _box(self, center, size=1.0):
        import numpy as np

        c = np.asarray(center, np.float32)
        h = size / 2
        v = np.array(
            [[x, y, z] for z in (-h, h) for y in (-h, h) for x in (-h, h)],
            np.float32,
        ) + c
        f = np.array(
            [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
             [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
            np.int32,
        )
        return TriangleMesh.create(jnp.asarray(v), jnp.asarray(f))

    def test_union_intersection_difference_volumes(self):
        import numpy as np

        a = self._box((0.0, 0.0, 0.0))
        b = self._box((0.5, 0.0, 0.0))

        def volume(mesh):
            # parity occupancy on a sample grid (winding-independent:
            # marching tetrahedra emits arbitrary triangle orientation)
            from open3d_tpu.geometry.raycasting import RaycastingScene

            v, t = mesh.compact()
            scene = RaycastingScene()
            scene.add_triangles(v, t)
            g = np.linspace(-0.6, 1.1, 35, dtype=np.float32)
            xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
            pts = jnp.asarray(np.stack([xx, yy, zz], -1).reshape(-1, 3))
            occ = np.asarray(scene.compute_occupancy(pts))
            cell = float(g[1] - g[0]) ** 3
            return occ.sum() * cell

        vs = 0.05
        un = mo.boolean_union(a, b, voxel_size=vs)
        it = mo.boolean_intersection(a, b, voxel_size=vs)
        df = mo.boolean_difference(a, b, voxel_size=vs)
        # analytic: |A|=1, |B|=1, overlap=0.5 -> union 1.5, inter 0.5, diff 0.5
        assert abs(volume(un) - 1.5) < 0.12, volume(un)
        assert abs(volume(it) - 0.5) < 0.08, volume(it)
        assert abs(volume(df) - 0.5) < 0.08, volume(df)
        # orientation sanity: all three produce non-trivial watertight-ish sets
        for m in (un, it, df):
            assert int(m.num_triangles()) > 50


class TestUVAtlasBaking:
    def test_atlas_and_vertex_bake_roundtrip(self):
        """(ref: ComputeUVAtlas + BakeVertexAttrTextures,
        t/geometry/TriangleMesh.h / kernel/UVUnwrapping.cpp)"""
        import numpy as np

        v = jnp.asarray(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], jnp.float32
        )
        t = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        colors = jnp.asarray(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], jnp.float32
        )
        mesh = TriangleMesh.create(v, t, vertex_attrs={"colors": colors})
        mesh = mo.compute_uv_atlas(mesh, size=64)
        uvs = np.asarray(mesh.triangle_attrs["texture_uvs"])
        assert uvs.shape == (2, 3, 2)
        assert (uvs >= 0).all() and (uvs <= 1).all()
        # patches must not overlap: triangle 0 and 1 share a block but
        # disjoint halves
        tex = mo.bake_vertex_attr_textures(mesh, ["colors"], size=64)["colors"]
        tex = np.asarray(tex)
        assert tex.shape == (64, 64, 3)
        # sample at each triangle's uv barycenter -> mean of vertex colors
        cn = np.asarray(colors)
        tn = np.asarray(t)
        for k in range(2):
            uv_c = uvs[k].mean(axis=0) * 64
            x, y = int(round(uv_c[0])), int(round(uv_c[1]))
            expected = cn[tn[k]].mean(axis=0)
            got = tex[y, x]
            assert np.allclose(got, expected, atol=0.12), (k, got, expected)
        # per-vertex corners reproduce the vertex colors
        for k in range(2):
            for j in range(3):
                x, y = (uvs[k, j] * 64).round().astype(int)
                assert np.allclose(tex[y, x], cn[tn[k, j]], atol=0.15)

    def test_triangle_bake_constant_patches(self):
        v = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
        t = jnp.asarray([[0, 1, 2]], jnp.int32)
        mesh = TriangleMesh.create(
            v, t, triangle_attrs={"labels": jnp.asarray([[0.25]], jnp.float32)}
        )
        mesh = mo.compute_uv_atlas(mesh, size=32)
        import numpy as np

        tex = np.asarray(
            mo.bake_triangle_attr_textures(mesh, ["labels"], size=32)["labels"]
        )
        uvs = np.asarray(mesh.triangle_attrs["texture_uvs"])
        uv_c = uvs[0].mean(axis=0) * 32
        assert abs(tex[int(uv_c[1]), int(uv_c[0]), 0] - 0.25) < 1e-6
