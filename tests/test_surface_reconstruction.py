"""Surface reconstruction tests: FFT-Poisson on an oriented sphere cloud,
dense marching tetrahedra on an analytic SDF, alpha shape on a cube."""

import jax.numpy as jnp
import numpy as np

from open3d_tpu.pipelines import surface_reconstruction as sr


def _sphere_cloud(n=2000, r=0.5, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (r * v).astype(np.float32), v.astype(np.float32)


def test_marching_tetrahedra_dense_sphere():
    n = 32
    g = (jnp.arange(n) + 0.5) / n - 0.5
    xx, yy, zz = jnp.meshgrid(g, g, g, indexing="ij")
    sdf = jnp.sqrt(xx**2 + yy**2 + zz**2) - 0.35
    mesh = sr.marching_tetrahedra_dense(
        sdf, 0.0, origin=(0.5 / n - 0.5,) * 3, spacing=1.0 / n,
        triangle_capacity=65536,
    )
    tm = np.asarray(mesh.triangle_mask)
    assert tm.sum() > 500
    v = np.asarray(mesh.vertices)[np.asarray(mesh.triangles)[tm].ravel()]
    rad = np.linalg.norm(v, axis=1)
    np.testing.assert_allclose(rad.mean(), 0.35, atol=0.01)
    assert rad.std() < 0.02
    # surface area ~ 4 pi r^2
    tri = np.asarray(mesh.vertices)[np.asarray(mesh.triangles)[tm]]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    ).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.35**2, rtol=0.08)


def test_poisson_fft_sphere():
    pts, nrm = _sphere_cloud()
    mesh, chi, origin, spacing = sr.reconstruct_poisson_fft(
        jnp.asarray(pts), jnp.asarray(nrm), depth=5, triangle_capacity=65536
    )
    tm = np.asarray(mesh.triangle_mask)
    assert tm.sum() > 300
    v = np.asarray(mesh.vertices)[np.asarray(mesh.triangles)[tm].ravel()]
    rad = np.linalg.norm(v, axis=1)
    # reconstructed surface must be a sphere-ish shell near r=0.5
    assert abs(float(rad.mean()) - 0.5) < 0.08
    assert float(rad.std()) < 0.05


def test_alpha_shape_cube():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (1500, 3)).astype(np.float32)
    verts, tris = sr.reconstruct_alpha_shape(pts, alpha=0.3)
    assert len(tris) > 100
    # total boundary area close to cube surface (loose: alpha boundary is bumpy)
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    assert 4.0 < area < 9.0
    # closed 2-manifold: every edge shared by exactly 2 triangles
    edges = {}
    for t in tris:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[0], t[2])):
            k = tuple(sorted(e))
            edges[k] = edges.get(k, 0) + 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).mean() > 0.95
