"""Closed-form eigh3x3 and 6x6 Cholesky vs numpy (ref behavior:
core/linalg/kernel/SVD3x3.h, kernel/TransformationConverter.h DecodeAndSolve6x6)."""

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.core import linalg


def test_eigh3x3_matches_numpy():
    key = jax.random.PRNGKey(0)
    B = jax.random.normal(key, (64, 3, 3))
    A = B @ jnp.swapaxes(B, -1, -2)  # SPD-ish
    evals, evecs = linalg.eigh3x3(A)
    ref_vals = np.linalg.eigvalsh(np.asarray(A))
    np.testing.assert_allclose(np.asarray(evals), ref_vals, rtol=1e-3, atol=1e-4)
    # eigenvector property: A v = lambda v
    Av = np.einsum("nij,njk->nik", np.asarray(A), np.asarray(evecs))
    lv = np.asarray(evals)[:, None, :] * np.asarray(evecs)
    np.testing.assert_allclose(Av, lv, atol=5e-3)


def test_eigh3x3_degenerate():
    A = jnp.eye(3)[None] * 2.0
    evals, evecs = linalg.eigh3x3(A)
    np.testing.assert_allclose(np.asarray(evals), [[2.0, 2.0, 2.0]], atol=1e-5)
    # orthonormal
    VtV = np.asarray(jnp.swapaxes(evecs, -1, -2) @ evecs)
    np.testing.assert_allclose(VtV, np.eye(3)[None], atol=1e-5)


def test_eigh3x3_planar_covariance():
    """Covariance of points on a plane: smallest eigvec == plane normal."""
    key = jax.random.PRNGKey(1)
    pts2d = jax.random.normal(key, (500, 2))
    normal = jnp.array([1.0, 2.0, -0.5])
    normal = normal / jnp.linalg.norm(normal)
    # basis orthogonal to normal
    u = jnp.cross(normal, jnp.array([0.0, 0.0, 1.0]))
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(normal, u)
    pts = pts2d[:, :1] * u + pts2d[:, 1:] * v
    cov = (pts.T @ pts / 500.0)[None]
    _, evecs = linalg.eigh3x3(cov)
    n_est = np.asarray(evecs[0, :, 0])
    dot = abs(float(np.dot(n_est, np.asarray(normal))))
    assert dot > 0.999


def test_solve_6x6():
    key = jax.random.PRNGKey(2)
    J = jax.random.normal(key, (100, 6))
    JtJ = J.T @ J
    x_true = jnp.arange(1.0, 7.0)
    b = JtJ @ x_true
    x = linalg.solve_cholesky6x6(JtJ, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), rtol=1e-3)


def test_solve_gn_6x6_batched():
    key = jax.random.PRNGKey(3)
    J = jax.random.normal(key, (4, 50, 6))
    JtJ = jnp.einsum("bni,bnj->bij", J, J)
    x_true = jax.random.normal(jax.random.PRNGKey(4), (4, 6))
    Jtr = -jnp.einsum("bij,bj->bi", JtJ, x_true)
    x = linalg.solve_gn_6x6(JtJ, Jtr, damping=0.0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), rtol=1e-2, atol=1e-3)
