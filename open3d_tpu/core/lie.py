"""SO(3)/SE(3) Lie-group utilities.

The reference keeps poses as Eigen 4x4 Float64 matrices and converts a 6-vector
pose [rx, ry, rz, tx, ty, tz] to a transform via
`t/pipelines/kernel/TransformationConverter.{h,cpp}` (PoseToTransformation).
Here we use the proper se(3) exponential/log maps (numerically guarded for
small angles) in float32, which agrees with the reference's small-angle update
to first order and is better conditioned for iterated Gauss-Newton composition
on TPU where float64 is unavailable.

Conventions:
- pose 6-vector xi = [omega (3), v (3)] — rotation first, like the reference.
- transforms are (..., 4, 4) row-major matrices acting on column vectors.
- all functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    rows = [
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_terms(theta2: jnp.ndarray):
    """Returns (A, B, C) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3) with
    Taylor guards at t ~ 0, given theta^2."""
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS**2))
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    return a, b, c


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_terms(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3). Stable for theta in [0, pi).

    Every branch is guarded with the double-where idiom so forward/reverse AD
    through the *untaken* branch never produces NaN (jacfwd of pose-graph
    residuals differentiates this at exactly theta = 0)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_raw = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    small = cos_theta > 1.0 - 1e-7  # theta < ~4.5e-4
    # mid branch: arccos of a value bounded away from +-1 (finite derivative)
    cos_mid = jnp.clip(jnp.where(small, 0.0, cos_theta), -1.0, 1.0 - 1e-7)
    theta = jnp.arccos(cos_mid)
    sin_theta = jnp.sin(theta)
    scale_mid = theta / jnp.maximum(sin_theta, _EPS)
    # small branch: theta/sin(theta) = 1 + t^2/6 + O(t^4), t^2 ~ 2(1-cos t)
    scale_small = 1.0 + (1.0 - cos_theta) / 3.0
    scale = jnp.where(small, scale_small, scale_mid)
    w = w_raw * scale[..., None]
    # Near theta = pi, sin(theta) ~ 0 and the above is ill-conditioned. Recover
    # the axis from the symmetric part: (R + R^T)/2 = cos(t) I + (1-cos t) n n^T,
    # so outer = n n^T up to scale; take the row with the largest diagonal.
    # The scale theta/sin(theta) amplifies f32 arccos error by ~1/(pi-theta),
    # so switch to the symmetric-part recovery well before pi (theta > 3.0,
    # where the arcsin-based theta below is still exact).
    near_pi = theta > 3.0
    B = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    denom = jnp.maximum(1.0 - cos_theta, _EPS)
    outer = (B - cos_theta[..., None, None] * eye) / denom[..., None, None]
    n2 = jnp.maximum(
        jnp.stack([outer[..., 0, 0], outer[..., 1, 1], outer[..., 2, 2]], axis=-1), 0.0
    )
    # sqrt-at-0 has an infinite derivative: keep the untaken branch away from 0
    n2 = jnp.where(near_pi[..., None], n2, 1.0)
    k = jnp.argmax(n2, axis=-1)
    row = jnp.take_along_axis(outer, k[..., None, None].repeat(3, axis=-1), axis=-2)[..., 0, :]
    nk = jnp.sqrt(jnp.take_along_axis(n2, k[..., None], axis=-1))[..., 0]
    axis = row / jnp.maximum(nk, _EPS)[..., None]
    # Disambiguate the global sign using the antisymmetric part (valid until
    # exactly pi, where both signs are equivalent).
    s = jnp.where(jnp.sum(axis * w_raw, axis=-1) < 0.0, -1.0, 1.0)
    # arccos(theta) is ill-conditioned near pi in f32 (the error goes as
    # sqrt(eps)); recover theta from the antisymmetric part instead:
    # ||w_raw|| = sin(theta), and theta = pi - arcsin(sin theta) for theta
    # in (pi/2, pi], which is well-conditioned.
    w_raw_safe = jnp.where(near_pi[..., None], w_raw, 1.0)  # norm'(0) is inf
    sin_norm = jnp.clip(jnp.linalg.norm(w_raw_safe, axis=-1), 0.0, 1.0 - 1e-7)
    theta_pi = jnp.pi - jnp.arcsin(sin_norm)
    w_pi = axis * (s * theta_pi)[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp: (..., 6) [omega, v] -> (..., 4, 4)."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, c = _sinc_terms(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) [omega, v]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_terms(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    coef = jnp.where(
        theta2 < 1e-8,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - a / (2.0 * b)) / jnp.maximum(theta2, _EPS),
    )
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def rt_to_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4) (ref: RtToTransformation)."""
    T = jnp.zeros(R.shape[:-2] + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Fast inverse of a rigid transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (4, 4) rigid transform to (..., 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t


def rotate_vectors(T: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation part (e.g. to normals)."""
    return vecs @ jnp.swapaxes(T[..., :3, :3], -1, -2)


def pose_distance(Ta: jnp.ndarray, Tb: jnp.ndarray):
    """(rot_angle_rad, trans_dist) between two transforms — test/eval helper."""
    dT = invert_se3(Ta) @ Tb
    w = so3_log(dT[..., :3, :3])
    return jnp.linalg.norm(w, axis=-1), jnp.linalg.norm(dT[..., :3, 3], axis=-1)
