"""SE(3)/SO(3) round-trip and identity tests (ref behavior:
t/pipelines/kernel/TransformationConverter PoseToTransformation &
utility/Eigen.cpp TransformVector6dToMatrix4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.core import lie


def random_xi(key, scale_w=1.0, scale_v=1.0):
    kw, kv = jax.random.split(key)
    w = jax.random.normal(kw, (3,)) * scale_w
    v = jax.random.normal(kv, (3,)) * scale_v
    return jnp.concatenate([w, v])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_se3_exp_log_roundtrip(seed):
    xi = random_xi(jax.random.PRNGKey(seed))
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_so3_exp_is_rotation():
    w = jnp.array([0.3, -0.5, 1.2])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-5


def test_small_angle_stability():
    xi = jnp.array([1e-9, -1e-9, 1e-10, 0.1, 0.2, 0.3])
    T = lie.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T[:3, 3]), [0.1, 0.2, 0.3], atol=1e-6)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2[3:]), [0.1, 0.2, 0.3], atol=1e-5)


def test_invert_and_compose():
    xi = random_xi(jax.random.PRNGKey(7))
    T = lie.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(T @ lie.invert_se3(T)), np.eye(4), atol=1e-5)


def test_transform_points_matches_matmul():
    xi = random_xi(jax.random.PRNGKey(11))
    T = lie.se3_exp(xi)
    pts = jax.random.normal(jax.random.PRNGKey(3), (100, 3))
    out = lie.transform_points(T, pts)
    h = jnp.concatenate([pts, jnp.ones((100, 1))], axis=1)
    expected = (h @ T.T)[:, :3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_batched():
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    xis = jnp.stack([random_xi(k) for k in keys])
    Ts = lie.se3_exp(xis)
    assert Ts.shape == (8, 4, 4)
    back = lie.se3_log(Ts)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xis), atol=1e-4)


def test_near_pi_log():
    w = jnp.array([0.0, 0.0, 3.14])
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-3)
