"""Pose-graph optimization tests: noisy odometry chain + loop closures,
false-loop rejection via the line process, JSON round-trip.

(ref test model: cpp/tests/pipelines/registration — plus the
DemoPoseGraphOptimization dataset flow in examples)"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.core import lie
from open3d_tpu.pipelines import pose_graph as pg


def _circle_trajectory(F=12, radius=2.0):
    """Ground-truth poses on a circle, heading tangent."""
    poses = []
    for i in range(F):
        th = 2 * np.pi * i / F
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = np.array([radius * c, radius * s, 0], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T)
    return np.stack(poses)


def _rel(Ts, i, j):
    """Edge X with T_j = T_i @ X."""
    return np.linalg.inv(Ts[i]) @ Ts[j]


def _noise(rng, scale):
    xi = rng.normal(0, scale, 6).astype(np.float32)
    return np.asarray(lie.se3_exp(jnp.asarray(xi)))


def _build_graph(F=12, odo_noise=0.03, rng=None, with_false_loop=False):
    rng = rng or np.random.RandomState(0)
    gt = _circle_trajectory(F)
    edges, trans, unc = [], [], []
    # odometry chain (certain edges), with noise
    for i in range(F - 1):
        edges.append((i, i + 1))
        trans.append(_noise(rng, odo_noise) @ _rel(gt, i, i + 1))
        unc.append(False)
    # loop closures (uncertain), low noise
    for i, j in [(0, F // 2), (1, F // 2 + 1), (0, F - 1), (2, F - 4), (3, F - 3)]:
        edges.append((i, j))
        trans.append(_noise(rng, 0.001) @ _rel(gt, i, j))
        unc.append(True)
    if with_false_loop:
        edges.append((2, F - 3))
        bogus = np.eye(4, dtype=np.float32)
        bogus[:3, 3] = (1.5, -1.0, 0.7)
        trans.append(bogus)  # completely wrong constraint
        unc.append(True)
    # init poses: integrate the noisy odometry (drifts)
    init = [gt[0]]
    for i in range(F - 1):
        init.append(init[-1] @ trans[i])
    # information ~ n_correspondences * I, as GetInformationMatrix yields
    # (the line-process weight mu scales with mean info[5,5])
    infos = np.tile(500.0 * np.eye(6, dtype=np.float32), (len(edges), 1, 1))
    graph = pg.PoseGraph.create(
        np.stack(init), np.array(edges, np.int32), np.stack(trans),
        informations=infos, uncertain=np.array(unc),
    )
    return graph, gt


def _ate(poses, gt):
    d = np.asarray(poses)[:, :3, 3] - gt[:, :3, 3]
    return float(np.sqrt((d**2).sum(1).mean()))


class TestGlobalOptimization:
    def test_reduces_drift(self):
        graph, gt = _build_graph()
        before = _ate(graph.poses, gt)
        out = pg.global_optimization(graph)
        after = _ate(out.poses, gt)
        assert after < before * 0.35
        # noise floor: 11 odometry edges at sigma=0.03 vs 5 near-exact loops,
        # equal information -> the MAP solution keeps ~0.05-0.07 m ATE
        assert after < 0.08

    def test_false_loop_pruned(self):
        graph, gt = _build_graph(with_false_loop=True)
        out = pg.global_optimization_two_pass(graph)
        # the bogus edge is the last one; line process must kill it
        assert not bool(out.edge_valid[-1])
        # odometry edges all survive; most true loops survive (a loop sharing
        # a node with the bogus edge may be collateral of the line process)
        assert bool(jnp.all(out.edge_valid[:11]))
        assert int(jnp.sum(out.edge_valid[11:-1])) >= 4
        assert _ate(out.poses, gt) < 0.08

    def test_residual_zero_at_ground_truth(self):
        gt = _circle_trajectory(8)
        edges = np.array([(i, i + 1) for i in range(7)], np.int32)
        trans = np.stack([_rel(gt, i, i + 1) for i in range(7)])
        graph = pg.PoseGraph.create(gt, edges, trans)
        r = jax.vmap(pg._edge_residual)(
            graph.poses[edges[:, 0]], graph.poses[edges[:, 1]], graph.transformations
        )
        assert float(jnp.max(jnp.abs(r))) < 1e-4


class TestPoseGraphIO:
    def test_json_roundtrip(self, tmp_path):
        graph, _ = _build_graph(F=6)
        p = str(tmp_path / "pg.json")
        pg.write_pose_graph(p, graph)
        with open(p) as f:
            d = json.load(f)
        assert d["class_name"] == "PoseGraph"
        g2 = pg.read_pose_graph(p)
        np.testing.assert_allclose(np.asarray(g2.poses), np.asarray(graph.poses), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g2.transformations), np.asarray(graph.transformations), atol=1e-5
        )
        assert np.array_equal(np.asarray(g2.uncertain), np.asarray(graph.uncertain))
