"""Small dense linear algebra used by the pipelines.

The reference dispatches to LAPACK/cuSOLVER for generic sizes
(cpp/open3d/core/linalg/) but hand-rolls the perf-critical fixed-size cases:
SVD3x3.h for normal estimation covariances and a 6x6 LDLT inside
DecodeAndSolve6x6 (t/pipelines/kernel/TransformationConverter.h:48).

On TPU we do the same specialization, but branch-free and batched:
- closed-form symmetric 3x3 eigendecomposition (trigonometric method) —
  pure VPU elementwise math, vmappable over millions of covariances;
- 6x6 solves via an unrolled Cholesky with Tikhonov damping — float32-safe
  for Gauss-Newton normal equations.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def eigh3x3(A: jnp.ndarray):
    """Batched symmetric 3x3 eigendecomposition, ascending eigenvalues.

    Args:  A: (..., 3, 3) symmetric (only the upper triangle is read).
    Returns: (eigvals (..., 3) ascending, eigvecs (..., 3, 3) column-wise).

    Closed-form trigonometric eigenvalues (Smith 1961) + cross-product
    eigenvectors; accurate to ~1e-6 relative for well-scaled inputs, which is
    ample for normal estimation (reference: core/linalg/kernel/SVD3x3.h and
    geometry/EstimateNormals.cpp FastEigen3x3).
    """
    dtype = A.dtype
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    # Scale for conditioning.
    scale = jnp.maximum(
        jnp.max(
            jnp.stack([jnp.abs(a00), jnp.abs(a01), jnp.abs(a02), jnp.abs(a11), jnp.abs(a12), jnp.abs(a22)], axis=-1),
            axis=-1,
        ),
        _EPS,
    )
    a00, a01, a02 = a00 / scale, a01 / scale, a02 / scale
    a11, a12, a22 = a11 / scale, a12 / scale, a22 / scale

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    p_safe = jnp.maximum(p, _EPS)

    # det(B / p) / 2
    c00, c01, c02 = b00 / p_safe, a01 / p_safe, a02 / p_safe
    c11, c12, c22 = b11 / p_safe, a12 / p_safe, b22 / p_safe
    det = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(det / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e2 = q + 2.0 * p * jnp.cos(phi)  # largest
    e0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e1 = 3.0 * q - e0 - e2
    evals = jnp.stack([e0, e1, e2], axis=-1)

    def eigvec(lam):
        # rows of (A - lam I)
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c01v = jnp.cross(r0, r1)
        c12v = jnp.cross(r1, r2)
        c02v = jnp.cross(r0, r2)
        n01 = jnp.sum(c01v * c01v, axis=-1)
        n12 = jnp.sum(c12v * c12v, axis=-1)
        n02 = jnp.sum(c02v * c02v, axis=-1)
        best = jnp.argmax(jnp.stack([n01, n12, n02], axis=-1), axis=-1)
        v = jnp.where(
            (best == 0)[..., None], c01v, jnp.where((best == 1)[..., None], c12v, c02v)
        )
        norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS))
        return v / norm

    v0 = eigvec(e0)
    v2 = eigvec(e2)
    # Orthogonalize: v1 = v2 x v0 guarantees a right-handed orthonormal frame.
    v1 = jnp.cross(v2, v0)
    v1 = v1 / jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, axis=-1, keepdims=True), _EPS))
    # Re-orthogonalize v0 against the other two for near-degenerate spectra.
    v0 = jnp.cross(v1, v2)

    evecs = jnp.stack([v0, v1, v2], axis=-1)  # columns
    # Degenerate (p ~ 0): A ~ q*I, return identity basis.
    iso = (p < 1e-10)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), evecs.shape)
    evecs = jnp.where(iso, eye, evecs)
    return evals * scale[..., None], evecs


def solve3x3(A: jnp.ndarray, b: jnp.ndarray, damping: float = 1e-9) -> jnp.ndarray:
    """Batched (..., 3, 3) @ x = (..., 3) via the adjugate (closed form,
    branch-free; used by color-gradient estimation — reference solves the
    same tiny systems in-kernel, t/geometry/kernel/PointCloudImpl.h)."""
    A = A + damping * jnp.eye(3, dtype=A.dtype)
    a, b_, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b_ * i
    co02 = b_ * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b_ * g - a * h
    co22 = a * e - b_ * d
    det = a * co00 + b_ * co10 + c * co20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS, jnp.inf, det)
    x0 = (co00 * b[..., 0] + co01 * b[..., 1] + co02 * b[..., 2]) * inv_det
    x1 = (co10 * b[..., 0] + co11 * b[..., 1] + co12 * b[..., 2]) * inv_det
    x2 = (co20 * b[..., 0] + co21 * b[..., 1] + co22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def cholesky6x6(A: jnp.ndarray) -> jnp.ndarray:
    """Unrolled batched Cholesky for (..., 6, 6) SPD matrices."""
    L = jnp.zeros_like(A)
    for j in range(6):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[..., j, k] * L[..., j, k]
        d = jnp.sqrt(jnp.maximum(s, _EPS))
        L = L.at[..., j, j].set(d)
        for i in range(j + 1, 6):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[..., i, k] * L[..., j, k]
            L = L.at[..., i, j].set(s / d)
    return L


def solve_cholesky6x6(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (..., 6, 6) @ x = (..., 6) via unrolled Cholesky."""
    L = cholesky6x6(A)
    # forward substitution
    y = jnp.zeros_like(b)
    for i in range(6):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[..., k]
        y = y.at[..., i].set(s / L[..., i, i])
    # backward substitution
    x = jnp.zeros_like(b)
    for i in reversed(range(6)):
        s = y[..., i]
        for k in range(i + 1, 6):
            s = s - L[..., k, i] * x[..., k]
        x = x.at[..., i].set(s / L[..., i, i])
    return x


def solve_gn_6x6(JtJ: jnp.ndarray, Jtr: jnp.ndarray, damping: float = 1e-6) -> jnp.ndarray:
    """Solve the Gauss-Newton normal equations JtJ dx = -Jtr with relative
    Tikhonov damping (float32-safe; reference solves undamped LDLT in f64,
    kernel/TransformationConverter.h:48 DecodeAndSolve6x6)."""
    diag = jnp.diagonal(JtJ, axis1=-2, axis2=-1)
    lam = damping * jnp.maximum(jnp.max(diag, axis=-1), 1.0)
    A = JtJ + lam[..., None, None] * jnp.eye(6, dtype=JtJ.dtype)
    return solve_cholesky6x6(A, -Jtr)
