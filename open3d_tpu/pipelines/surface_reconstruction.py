"""Surface reconstruction from point clouds, TPU-native.

Reference surface (SURVEY.md §2.5):
- Poisson      — geometry/SurfaceReconstructionPoisson.cpp (PoissonRecon, host octree multigrid)
- Alpha shape  — geometry/SurfaceReconstructionAlphaShape.cpp (Qhull Delaunay)
- Ball pivot   — geometry/SurfaceReconstructionBallPivoting.cpp (serial pivoting)

TPU re-design: the Poisson solve is re-expressed as the FFT-form indicator
reconstruction (Kazhdan, SGP'05 — the Fourier formulation the Poisson paper
builds on): splat oriented normals into a dense vector field V on a regular
grid, solve ∆χ = ∇·V in closed form in Fourier space (one 3D FFT pair — a
dense, static-shape, XLA-native program that replaces PoissonRecon's host
octree multigrid), then extract the iso-surface with marching tetrahedra.
Alpha shapes keep the reference's own structure (host Qhull/Delaunay).
Ball pivoting is inherently serial front propagation (worst case for TPU);
alpha shapes at radius ~= ball radius provide the equivalent capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.geometry import voxel_block_grid as _vbg
from open3d_tpu.geometry.trianglemesh import TriangleMesh


# ------------------------------------------------------ marching on a grid --
def marching_tetrahedra_dense(field: jnp.ndarray, iso: float = 0.0,
                              origin=(0.0, 0.0, 0.0), spacing: float = 1.0,
                              triangle_capacity: int = 131072) -> TriangleMesh:
    """Iso-surface of a dense (X, Y, Z) scalar field as a fixed-capacity
    triangle soup (same 6-tet cube split as the sparse TSDF extractor,
    voxel_block_grid._tet_tables)."""
    X, Y, Z = field.shape
    gx, gy, gz = jnp.meshgrid(
        jnp.arange(X - 1), jnp.arange(Y - 1), jnp.arange(Z - 1), indexing="ij"
    )
    base = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)  # (C,3) cube corners
    corners = base[:, None, :] + _vbg._CORNER_OFFSETS[None, :, :]  # (C,8,3)
    vals = field[corners[..., 0], corners[..., 1], corners[..., 2]]  # (C,8)
    pos = corners.astype(jnp.float32) * spacing + jnp.asarray(origin, jnp.float32)

    tet_vals = vals[:, _vbg._CUBE_TETS]  # (C,6,4)
    tet_pos = pos[:, _vbg._CUBE_TETS]  # (C,6,4,3)
    inside = (tet_vals < iso).astype(jnp.int32)
    case = (
        inside[..., 0] | (inside[..., 1] << 1) | (inside[..., 2] << 2)
        | (inside[..., 3] << 3)
    )  # (C,6)
    edges = _vbg._TET_EDGES[case]  # (C,6,2,3,2)
    n_tris = _vbg._TET_COUNT[case]  # (C,6)

    a_ids = jnp.maximum(edges[..., 0], 0)
    b_ids = jnp.maximum(edges[..., 1], 0)

    def g(vals4, ids):
        return jnp.take_along_axis(
            vals4[:, :, None, None, :], ids[..., None], axis=-1
        )[..., 0]

    va = g(tet_vals, a_ids)
    vb = g(tet_vals, b_ids)

    def gp(pos4, ids):
        return jnp.take_along_axis(
            pos4[:, :, None, None, :, :],
            ids[..., None, None].repeat(3, -1),
            axis=-2,
        )[..., 0, :]

    pa = gp(tet_pos, a_ids)
    pb = gp(tet_pos, b_ids)
    t = (iso - va) / jnp.where(jnp.abs(vb - va) > 1e-12, vb - va, 1.0)
    t = jnp.clip(t, 0.0, 1.0)
    verts = pa + t[..., None] * (pb - pa)  # (C,6,2,3,3)

    tri_idx = jnp.arange(2)[None, None, :]
    valid_tri = (tri_idx < n_tris[..., None]) & (edges[..., 0, 0] >= 0)
    tri_verts = verts.reshape(-1, 3, 3)
    tri_mask = valid_tri.reshape(-1)

    # compact to capacity
    order = jnp.argsort(~tri_mask, stable=True)
    tri_verts = tri_verts[order][:triangle_capacity]
    tri_mask = tri_mask[order][:triangle_capacity]
    return TriangleMesh.from_triangle_soup(tri_verts, tri_mask)


# --------------------------------------------------------- Poisson via FFT --
def reconstruct_poisson_fft(
    positions: jnp.ndarray,
    normals: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    depth: int = 6,
    padding: float = 0.1,
    triangle_capacity: int = 131072,
):
    """Indicator-function surface reconstruction (capability of
    geometry/SurfaceReconstructionPoisson.cpp CreateFromPointCloudPoisson,
    re-expressed as the FFT Poisson solve — one forward/inverse 3D FFT on a
    (2^depth)^3 grid, fully on-device).

    Returns (mesh, chi_grid, origin, spacing)."""
    n = 1 << depth
    if mask is None:
        mask = jnp.ones((positions.shape[0],), bool)
    w = mask.astype(jnp.float32)
    lo = jnp.min(jnp.where(mask[:, None], positions, jnp.inf), 0)
    hi = jnp.max(jnp.where(mask[:, None], positions, -jnp.inf), 0)
    span = jnp.max(hi - lo) * (1.0 + 2.0 * padding)
    origin = (lo + hi) / 2.0 - span / 2.0
    spacing = span / n

    # trilinear splat of normals into V (n,n,n,3)
    g = (positions - origin) / spacing - 0.5
    g0 = jnp.floor(g).astype(jnp.int32)
    frac = g - g0
    V = jnp.zeros((n, n, n, 3), jnp.float32)
    W = jnp.zeros((n, n, n), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cell = g0 + jnp.array([dx, dy, dz])
                wt = (
                    jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                    * jnp.where(dy, frac[:, 1], 1 - frac[:, 1])
                    * jnp.where(dz, frac[:, 2], 1 - frac[:, 2])
                ) * w
                ok = jnp.all((cell >= 0) & (cell < n), -1)
                lin = (cell[:, 0] * n + cell[:, 1]) * n + cell[:, 2]
                lin = jnp.where(ok, lin, n * n * n)
                V = V.reshape(-1, 3).at[lin].add(
                    normals * wt[:, None], mode="drop"
                ).reshape(n, n, n, 3)
                W = W.reshape(-1).at[lin].add(wt, mode="drop").reshape(n, n, n)

    # solve lap(chi) = div(V) in Fourier space:
    # chi_hat = (i k . V_hat) / -|k|^2
    k = jnp.fft.fftfreq(n) * 2.0 * jnp.pi  # cycles -> rad per cell
    kx, ky, kz = jnp.meshgrid(k, k, k, indexing="ij")
    k2 = kx * kx + ky * ky + kz * kz
    Vh = jnp.fft.fftn(V, axes=(0, 1, 2))
    div_h = 1j * (kx * Vh[..., 0] + ky * Vh[..., 1] + kz * Vh[..., 2])
    chi_h = jnp.where(k2 > 1e-12, div_h / -jnp.maximum(k2, 1e-12), 0.0)
    # mild Gaussian regularization (screening analog)
    chi_h = chi_h * jnp.exp(-0.5 * k2)
    chi = jnp.real(jnp.fft.ifftn(chi_h, axes=(0, 1, 2)))

    # iso level: mean chi at the samples (the Poisson paper's choice)
    gi = jnp.clip(jnp.round(g).astype(jnp.int32), 0, n - 1)
    chi_at = chi[gi[:, 0], gi[:, 1], gi[:, 2]]
    iso = jnp.sum(chi_at * w) / jnp.maximum(jnp.sum(w), 1.0)

    mesh = marching_tetrahedra_dense(
        chi - iso, 0.0, origin=origin, spacing=float(spacing),
        triangle_capacity=triangle_capacity,
    )
    return mesh, chi, origin, spacing


# -------------------------------------------------------------- alpha shape --
def reconstruct_alpha_shape(positions: np.ndarray, alpha: float,
                            mask: np.ndarray | None = None):
    """Alpha-shape mesh (ref: SurfaceReconstructionAlphaShape.cpp
    CreateFromPointCloudAlphaShape): Delaunay tetrahedralization (host Qhull,
    as in the reference), keep tetrahedra with circumradius < alpha, emit
    boundary faces (faces used by exactly one kept tet).

    Returns (vertices (V,3) f32, triangles (T,3) i32) numpy arrays."""
    from scipy.spatial import Delaunay

    pts = np.asarray(positions, np.float64)
    if mask is not None:
        pts = pts[np.asarray(mask, bool)]
    tet = Delaunay(pts)
    simp = tet.simplices  # (M,4)
    a, b, c, d = (pts[simp[:, i]] for i in range(4))

    # circumradius of each tetrahedron
    ba, ca, da = b - a, c - a, d - a
    det = np.einsum("ij,ij->i", ba, np.cross(ca, da))
    num = (
        np.einsum("ij,ij->i", ba, ba)[:, None] * np.cross(ca, da)
        + np.einsum("ij,ij->i", ca, ca)[:, None] * np.cross(da, ba)
        + np.einsum("ij,ij->i", da, da)[:, None] * np.cross(ba, ca)
    )
    safe = np.abs(det) > 1e-12
    circ = np.full(len(simp), np.inf)
    circ[safe] = np.linalg.norm(num[safe], axis=1) / (2.0 * np.abs(det[safe]))
    keep = circ < alpha

    faces = {}
    face_ids = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    for s in simp[keep]:
        for f in face_ids:
            key = tuple(sorted((s[f[0]], s[f[1]], s[f[2]])))
            faces[key] = faces.get(key, 0) + 1
    boundary = np.array([k for k, v in faces.items() if v == 1], np.int32)
    if len(boundary) == 0:
        return pts.astype(np.float32), np.zeros((0, 3), np.int32)

    # orient boundary faces outward from the mesh centroid (best effort)
    centroid = pts.mean(0)
    va, vb, vc = pts[boundary[:, 0]], pts[boundary[:, 1]], pts[boundary[:, 2]]
    nrm = np.cross(vb - va, vc - va)
    flip = np.einsum("ij,ij->i", nrm, (va + vb + vc) / 3 - centroid) < 0
    boundary[flip] = boundary[flip][:, [0, 2, 1]]
    return pts.astype(np.float32), boundary
