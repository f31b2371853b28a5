"""Multi-device sharded multiway alignment tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.core import lie
from open3d_tpu.data import synthetic
from open3d_tpu.parallel import fragments as pf


@pytest.fixture(scope="module")
def frag_world():
    """4 overlapping fragments sampled from the synthetic scene, each given a
    known pose perturbation; GT poses are identity in world frame."""
    key = jax.random.PRNGKey(3)
    F, N = 4, 1024
    pos, nrm, mask = [], [], []
    for i in range(F):
        key, sub = jax.random.split(key)
        pc = synthetic.sample_surface(synthetic.default_scene_sdf, sub, N)
        pos.append(pc.positions)
        nrm.append(pc.attrs["normals"])
        mask.append(pc.mask)
    return jnp.stack(pos), jnp.stack(nrm), jnp.stack(mask)


def _perturbed_poses(F, scale_rot=0.05, scale_t=0.05, seed=0):
    key = jax.random.PRNGKey(seed)
    xi = scale_rot * jax.random.normal(key, (F, 6))
    xi = xi.at[:, 3:].mul(scale_t / scale_rot)
    xi = xi.at[0].set(0.0)  # anchor
    return jax.vmap(lie.se3_exp)(xi)


def _chain_edges(F):
    e = [(i, i + 1) for i in range(F - 1)] + [(0, F - 1)]
    edges = jnp.array(e, jnp.int32)
    return edges, jnp.ones((edges.shape[0],), bool)


def test_multiway_align_recovers_poses(frag_world):
    pos, nrm, mask = frag_world
    F = pos.shape[0]
    # move fragments into their (perturbed) local frames: local = inv(T) world
    T_true = _perturbed_poses(F)
    local = jax.vmap(lambda T, p: lie.transform_points(lie.invert_se3(T), p))(T_true, pos)
    local_n = jax.vmap(lambda T, n: lie.rotate_vectors(lie.invert_se3(T), n))(T_true, nrm)
    edges, ev = _chain_edges(F)

    poses0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (F, 4, 4))
    poses, rmse, n_in = pf.multiway_align(
        local, local_n, mask, poses0, edges, ev, max_correspondence_distance=0.2, n_iterations=12
    )
    # recovered poses must match the true perturbations (up to the anchor)
    for i in range(F):
        rot_e, trans_e = lie.pose_distance(poses[i], T_true[i])
        assert float(trans_e) < 5e-3, (i, float(trans_e))
        assert float(rot_e) < 5e-3, (i, float(rot_e))
    # rmse floor: correspondences pair DIFFERENT random samplings of the
    # surface, so point-to-plane residuals don't vanish at perfect alignment
    assert float(rmse) < 0.02


def test_sharded_matches_single_device(frag_world):
    pos, nrm, mask = frag_world
    F = pos.shape[0]
    T_true = _perturbed_poses(F, 0.03, 0.03, seed=1)
    local = jax.vmap(lambda T, p: lie.transform_points(lie.invert_se3(T), p))(T_true, pos)
    local_n = jax.vmap(lambda T, n: lie.rotate_vectors(lie.invert_se3(T), n))(T_true, nrm)
    edges, ev = _chain_edges(F)
    poses0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (F, 4, 4))

    ref, rmse_ref, n_ref = pf.multiway_gn_step(
        local, local_n, mask, poses0, edges, ev, max_correspondence_distance=0.2
    )
    mesh = pf.make_mesh(8)
    assert mesh.devices.size == 8
    out, rmse_sh, n_sh = pf.multiway_gn_step(
        local, local_n, mask, poses0, edges, ev, max_correspondence_distance=0.2, mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    np.testing.assert_allclose(float(n_sh), float(n_ref), rtol=1e-6)
    np.testing.assert_allclose(float(rmse_sh), float(rmse_ref), atol=1e-5)
