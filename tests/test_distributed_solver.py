"""Distributed pose-graph PCG + Schur BA vs dense references.

Runs on the 8-device virtual CPU mesh (conftest). Mirrors the reference's
cross-engine test pattern: the dense replicated solve is the reference
implementation; the sharded matrix-free solver must match it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from open3d_tpu.core import lie
from open3d_tpu.parallel import solver as ds
from open3d_tpu.pipelines import pose_graph as pg


def _random_graph(F=12, n_loops=6, seed=0, noise=0.02):
    rng = np.random.default_rng(seed)
    # ground-truth trajectory
    poses_gt = [np.eye(4, dtype=np.float32)]
    for _ in range(F - 1):
        xi = np.concatenate([rng.normal(0, 0.1, 3), rng.normal(0, 0.3, 3)])
        poses_gt.append(
            np.asarray(poses_gt[-1] @ np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32))))
        )
    poses_gt = np.stack(poses_gt)

    edges, trans, unc = [], [], []
    for i in range(F - 1):  # odometry chain
        X = np.linalg.inv(poses_gt[i]) @ poses_gt[i + 1]
        xi = np.concatenate([rng.normal(0, noise, 3), rng.normal(0, noise, 3)])
        edges.append((i, i + 1))
        trans.append(X @ np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32))))
        unc.append(False)
    for _ in range(n_loops):  # loop closures
        i, j = sorted(rng.choice(F, 2, replace=False))
        X = np.linalg.inv(poses_gt[i]) @ poses_gt[j]
        edges.append((i, j))
        trans.append(X)
        unc.append(True)

    # start from noisy poses
    noisy = [poses_gt[0]]
    for i in range(F - 1):
        xi = np.concatenate([rng.normal(0, 0.03, 3), rng.normal(0, 0.05, 3)])
        noisy.append(
            np.asarray(
                noisy[-1]
                @ np.linalg.inv(poses_gt[i])
                @ poses_gt[i + 1]
                @ np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
            )
        )
    graph = pg.PoseGraph.create(
        np.stack(noisy), np.asarray(edges, np.int32), np.stack(trans), uncertain=np.asarray(unc)
    )
    return graph, poses_gt


def _mesh(name):
    return Mesh(np.asarray(jax.devices()).reshape(-1), (name,))


class TestDistributedPoseGraphSolve:
    def test_cg_matches_dense_solve(self):
        graph, _ = _random_graph()
        F = graph.poses.shape[0]
        w = jnp.where(graph.edge_valid, 1.0, 0.0)
        H, b, _ = pg._build_system(graph, w)
        lam = jnp.float32(1e-4)
        dx_dense = pg._solve(H, b, lam, 0)
        dx_cg = pg._solve_distributed(graph, w, lam, 0, None, "edges")
        # CG in f32 stops at ~1e-4 |b| residual: compare loosely
        np.testing.assert_allclose(
            np.asarray(dx_cg), np.asarray(dx_dense), rtol=3e-2, atol=2e-4
        )

    def test_cg_sharded_matches_unsharded(self):
        graph, _ = _random_graph(F=10, n_loops=5, seed=3)
        w = jnp.where(graph.edge_valid, 1.0, 0.0)
        lam = jnp.float32(1e-3)
        dx_local = pg._solve_distributed(graph, w, lam, 0, None, "edges")
        dx_mesh = pg._solve_distributed(graph, w, lam, 0, _mesh("edges"), "edges")
        np.testing.assert_allclose(
            np.asarray(dx_mesh), np.asarray(dx_local), rtol=1e-4, atol=1e-6
        )

    def test_global_optimization_mesh_converges(self):
        graph, poses_gt = _random_graph(F=10, n_loops=5, seed=1)
        out = pg.global_optimization(
            graph,
            criteria=pg.GlobalOptimizationConvergenceCriteria(max_iteration=30),
            mesh=_mesh("edges"),
        )
        # residuals should shrink strongly vs the noisy input
        r0 = np.asarray(pg._residuals(graph))
        r1 = np.asarray(pg._residuals(out))
        ev = np.asarray(graph.edge_valid)
        assert np.linalg.norm(r1[ev]) < 0.35 * np.linalg.norm(r0[ev])


class TestSchurBA:
    def _make_problem(self, F=5, L=40, seed=0, obs_noise=0.002):
        rng = np.random.default_rng(seed)
        X = rng.uniform(-1, 1, (L, 3)).astype(np.float32)
        poses = []
        for f in range(F):
            xi = np.concatenate([rng.normal(0, 0.2, 3), rng.normal(0, 0.5, 3)])
            poses.append(np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32))))
        poses = np.stack(poses)  # fragment -> world
        cam, lm, p = [], [], []
        for f in range(F):
            W = np.linalg.inv(poses[f])
            for l in range(L):
                cam.append(f)
                lm.append(l)
                p.append((W[:3, :3] @ X[l] + W[:3, 3]) + rng.normal(0, obs_noise, 3))
        prob = ds.BAProblem(
            cam=jnp.asarray(cam, jnp.int32),
            lm=jnp.asarray(lm, jnp.int32),
            p=jnp.asarray(np.asarray(p, np.float32)),
            w=jnp.ones((len(cam),), jnp.float32),
        )
        return poses, X, prob

    def test_ba_recovers_perturbation(self):
        poses, X, prob = self._make_problem()
        rng = np.random.default_rng(42)
        noisy_poses = poses.copy()
        for f in range(1, len(poses)):
            xi = np.concatenate([rng.normal(0, 0.02, 3), rng.normal(0, 0.03, 3)])
            noisy_poses[f] = poses[f] @ np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
        noisy_X = X + rng.normal(0, 0.02, X.shape).astype(np.float32)

        out_p, out_X, cost = ds.ba_gauss_newton(
            jnp.asarray(noisy_poses), jnp.asarray(noisy_X), prob, n_outer=8
        )
        # anchored at camera 0: compare relative poses
        def rel(Ps):
            return [np.linalg.inv(np.asarray(Ps[0])) @ np.asarray(Ps[f]) for f in range(len(poses))]

        err0 = max(
            np.linalg.norm(a - b) for a, b in zip(rel(noisy_poses), rel(poses))
        )
        err1 = max(np.linalg.norm(a - b) for a, b in zip(rel(out_p), rel(poses)))
        assert err1 < 0.2 * err0, (err0, err1)

    def test_ba_sharded_matches_unsharded(self):
        poses, X, prob = self._make_problem(F=4, L=21, seed=5)  # O = 84 not / 8
        rng = np.random.default_rng(1)
        noisy = poses.copy()
        noisy[1] = poses[1] @ np.asarray(
            lie.se3_exp(jnp.asarray([0.01, -0.02, 0.015, 0.02, 0.0, -0.01], jnp.float32))
        )
        p_l, X_l, _ = ds.ba_gauss_newton(
            jnp.asarray(noisy), jnp.asarray(X), prob, n_outer=3
        )
        p_m, X_m, _ = ds.ba_gauss_newton(
            jnp.asarray(noisy), jnp.asarray(X), prob, n_outer=3, mesh=_mesh("obs")
        )
        np.testing.assert_allclose(np.asarray(p_m), np.asarray(p_l), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(X_m), np.asarray(X_l), rtol=1e-4, atol=1e-5)
