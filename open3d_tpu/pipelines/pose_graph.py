"""Pose-graph optimization (multiway registration), TPU-native.

Reference surface: pipelines/registration/GlobalOptimization.{h,cpp} —
Choi-Zhou-Koltun CVPR'15 robust pose-graph optimization:
- PoseGraph{Node pose, Edge {source, target, transformation, information 6x6,
  uncertain, confidence}} (registration/PoseGraph.h:23-96), JSON-serializable.
- residual zeta_e = log(X_e^-1 * T_s^-1 * T_t) per edge
  (GlobalOptimization.cpp:165).
- line-process weights on uncertain (loop-closure) edges updated in closed
  form: l_e = (mu / (mu + r_e^T Lambda r_e))^2 (cpp:126-146).
- Levenberg-Marquardt on the dense 6n x 6n system (cpp:190-230), solved via
  sparse Cholesky / LDLT (utility/Eigen.cpp:19-70); edges pruned below
  confidence 0.25 and a second optimization pass runs
  (GlobalOptimizationConvergenceCriteria.h:17-142).

TPU design: the reference hand-derives approximate Jacobians from linearized
SE(3) generators (cpp:38-123). Here the exact 6x6 edge Jacobians come from
jax.jacfwd of the residual wrt left-multiplied local perturbations, vmapped
over all edges at once; the Hessian is assembled as a (F, F, 6, 6) block
scatter-add and solved densely on device (F = #fragments is small: a dense
6F x 6F Cholesky beats any sparse structure on the MXU until F is in the
thousands). The whole LM loop including the line-process update runs inside
lax.while_loop — zero host syncs.

Convention: node pose T_i maps node-local -> world; edge (s, t) stores X
with T_t ~= T_s @ X (the reference's convention, GlobalOptimization.cpp).
"""

from __future__ import annotations

import dataclasses
import json
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.core import lie


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["poses", "edges", "transformations", "informations", "uncertain", "confidence", "edge_valid"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PoseGraph:
    """Fixed-capacity pose graph (ref: registration/PoseGraph.h:96).

    poses (F, 4, 4); edges (E, 2) int32 [source, target]; transformations
    (E, 4, 4); informations (E, 6, 6); uncertain (E,) bool (True = loop
    closure, subject to the line process); confidence (E,) f32; edge_valid
    (E,) bool marks live rows (pruned/padded rows False)."""

    poses: jnp.ndarray
    edges: jnp.ndarray
    transformations: jnp.ndarray
    informations: jnp.ndarray
    uncertain: jnp.ndarray
    confidence: jnp.ndarray
    edge_valid: jnp.ndarray

    @staticmethod
    def create(poses, edges, transformations, informations=None, uncertain=None, edge_valid=None):
        poses = jnp.asarray(poses, jnp.float32)
        edges = jnp.asarray(edges, jnp.int32)
        transformations = jnp.asarray(transformations, jnp.float32)
        E = edges.shape[0]
        if informations is None:
            informations = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (E, 6, 6))
        else:
            informations = jnp.asarray(informations, jnp.float32)
        uncertain = (
            jnp.zeros((E,), bool) if uncertain is None else jnp.asarray(uncertain, bool)
        )
        edge_valid = (
            jnp.ones((E,), bool) if edge_valid is None else jnp.asarray(edge_valid, bool)
        )
        return PoseGraph(
            poses=poses,
            edges=edges,
            transformations=transformations,
            informations=informations,
            uncertain=uncertain,
            confidence=jnp.ones((E,), jnp.float32),
            edge_valid=edge_valid,
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[],
    meta_fields=["max_correspondence_distance", "edge_prune_threshold", "preference_loop_closure", "reference_node"],
)
@dataclasses.dataclass(frozen=True)
class GlobalOptimizationOption:
    """(ref: GlobalOptimizationConvergenceCriteria.h:17-142 defaults)"""

    max_correspondence_distance: float = 0.075
    edge_prune_threshold: float = 0.25
    preference_loop_closure: float = 1.0
    reference_node: int = 0


@dataclasses.dataclass(frozen=True)
class GlobalOptimizationConvergenceCriteria:
    max_iteration: int = 100
    min_relative_increment: float = 1e-6
    max_iteration_lm: int = 20


def _edge_residual(T_s, T_t, X):
    """zeta = log(X^-1 T_s^-1 T_t) (ref: GlobalOptimization.cpp:165)."""
    return lie.se3_log(lie.invert_se3(X) @ lie.invert_se3(T_s) @ T_t)


def _edge_residual_perturbed(delta, T_s, T_t, X):
    """Residual under left perturbations exp(d_s) T_s, exp(d_t) T_t."""
    d_s, d_t = delta[:6], delta[6:]
    return _edge_residual(lie.se3_exp(d_s) @ T_s, lie.se3_exp(d_t) @ T_t, X)


_edge_jac = jax.vmap(
    lambda T_s, T_t, X: jax.jacfwd(_edge_residual_perturbed)(
        jnp.zeros((12,), jnp.float32), T_s, T_t, X
    )
)


def _residuals(graph: PoseGraph):
    T_s = graph.poses[graph.edges[:, 0]]
    T_t = graph.poses[graph.edges[:, 1]]
    return jax.vmap(_edge_residual)(T_s, T_t, graph.transformations)


def _line_process_weights(r, Lambda, uncertain, valid, mu):
    """Closed-form line-process update (ref: cpp:126-146)."""
    quad = jnp.einsum("ei,eij,ej->e", r, Lambda, r)
    l = (mu / (mu + quad)) ** 2
    w = jnp.where(uncertain, l, 1.0)
    return jnp.where(valid, w, 0.0)


def _build_system(graph: PoseGraph, weights):
    """Assemble H (F, F, 6, 6) and b (F, 6) from all edges at once."""
    F = graph.poses.shape[0]
    s, t = graph.edges[:, 0], graph.edges[:, 1]
    T_s = graph.poses[s]
    T_t = graph.poses[t]
    r = jax.vmap(_edge_residual)(T_s, T_t, graph.transformations)  # (E, 6)
    J = _edge_jac(T_s, T_t, graph.transformations)  # (E, 6, 12)
    Js, Jt = J[:, :, :6], J[:, :, 6:]
    Lam = graph.informations * weights[:, None, None]

    JsL = jnp.einsum("eai,eab->ebi", Js, Lam)  # Js^T Lambda -> (E, 6, 6)
    JtL = jnp.einsum("eai,eab->ebi", Jt, Lam)
    H = jnp.zeros((F, F, 6, 6), jnp.float32)
    H = H.at[s, s].add(jnp.einsum("ebi,ebj->eij", JsL, Js))
    H = H.at[s, t].add(jnp.einsum("ebi,ebj->eij", JsL, Jt))
    H = H.at[t, s].add(jnp.einsum("ebi,ebj->eij", JtL, Js))
    H = H.at[t, t].add(jnp.einsum("ebi,ebj->eij", JtL, Jt))
    b = jnp.zeros((F, 6), jnp.float32)
    b = b.at[s].add(jnp.einsum("ebi,eb->ei", JsL, r))
    b = b.at[t].add(jnp.einsum("ebi,eb->ei", JtL, r))
    cost = jnp.sum(jnp.einsum("ea,eab,eb->e", r, Lam, r))
    return H, b, cost


def _solve(H, b, lam, anchor: int):
    """(H + lam*diag(H)) dx = -b with the reference node pinned."""
    F = H.shape[0]
    Hd = jnp.transpose(H, (0, 2, 1, 3)).reshape(6 * F, 6 * F)
    bd = b.reshape(6 * F)
    diag = jnp.diagonal(Hd)
    Hd = Hd + jnp.diag(lam * diag + 1e-9)
    # pin the anchor block: huge diagonal forces dx_anchor ~ 0
    a = anchor * 6 + jnp.arange(6)
    Hd = Hd.at[a, a].add(1e12)
    dx = jnp.linalg.solve(Hd, -bd)
    return dx.reshape(F, 6)


def _solve_distributed(graph: PoseGraph, weights, lam, anchor: int, mesh, axis):
    """Edge-sharded matrix-free PCG replacement for the dense solve
    (parallel/solver.py; SURVEY section 5.8's reduce-scatter/all-reduce
    design — one psum per H-apply over the `axis` mesh dimension)."""
    from open3d_tpu.parallel import solver as dsolver

    F = graph.poses.shape[0]
    s, t = graph.edges[:, 0], graph.edges[:, 1]
    T_s = graph.poses[s]
    T_t = graph.poses[t]
    r = jax.vmap(_edge_residual)(T_s, T_t, graph.transformations)
    J = _edge_jac(T_s, T_t, graph.transformations)
    Lam = graph.informations * weights[:, None, None]
    sys = dsolver.EdgeSystem(J[:, :, :6], J[:, :, 6:], Lam, r, s, t)
    return dsolver.solve_pose_graph_cg(sys, F, lam, anchor, mesh=mesh, axis=axis)


def global_optimization(
    graph: PoseGraph,
    option: GlobalOptimizationOption = GlobalOptimizationOption(),
    criteria: GlobalOptimizationConvergenceCriteria = GlobalOptimizationConvergenceCriteria(),
    mesh=None,
    mesh_axis: str = "edges",
) -> PoseGraph:
    """Robust LM pose-graph optimization with line-process edge weights.

    (ref: GlobalOptimizationLevenbergMarquardt::OptimizePoseGraph,
    GlobalOptimization.cpp + GlobalOptimizationMethod.h:67)

    With `mesh`, the inner solve is the edge-sharded matrix-free PCG
    (block-Jacobi preconditioned, one psum per Hessian apply) instead of the
    dense replicated 6F x 6F Cholesky — the distributed multiway solve of
    BASELINE.json's north-star config 5."""
    # mu = preference * dmax^2 * mean(info[5,5]) over edges
    # (ref: ComputeLineProcessWeight, GlobalOptimization.cpp:330-346)
    n_edges = jnp.maximum(jnp.sum(graph.edge_valid.astype(jnp.float32)), 1.0)
    avg_corr = jnp.sum(jnp.where(graph.edge_valid, graph.informations[:, 5, 5], 0.0)) / n_edges
    mu = (
        jnp.float32(option.preference_loop_closure * option.max_correspondence_distance**2)
        * avg_corr
    )
    anchor = option.reference_node

    def system_for(poses, conf):
        g = dataclasses.replace(graph, poses=poses)
        w = jnp.where(g.edge_valid, jnp.where(g.uncertain, conf, 1.0), 0.0)
        return (*_build_system(g, w), g)

    def cond(state):
        it, poses, conf, lam, done = state
        return (it < criteria.max_iteration) & ~done

    def body(state):
        it, poses, conf, lam, _ = state
        H, b, cost = system_for(poses, conf)[:3]
        if mesh is not None:
            g = dataclasses.replace(graph, poses=poses)
            w = jnp.where(g.edge_valid, jnp.where(g.uncertain, conf, 1.0), 0.0)
            dx = _solve_distributed(g, w, lam, anchor, mesh, mesh_axis)
        else:
            dx = _solve(H, b, lam, anchor)
        new_poses = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dx, poses)
        _, _, new_cost = system_for(new_poses, conf)[:3]
        improved = new_cost < cost
        poses = jnp.where(improved, new_poses, poses)
        lam = jnp.where(improved, jnp.maximum(lam / 3.0, 1e-7), jnp.minimum(lam * 3.0, 1e4))
        # closed-form line-process update AFTER the step (ref: UpdateConfidence
        # is called once per LM iteration, cpp:126-146) — weights start at 1.
        r = _residuals(dataclasses.replace(graph, poses=poses))
        conf = jnp.where(
            improved,
            _line_process_weights(r, graph.informations, graph.uncertain, graph.edge_valid, mu),
            conf,
        )
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, 1e-12)
        done = improved & (rel < criteria.min_relative_increment)
        return (it + 1, poses, conf, lam, done)

    init = (
        jnp.int32(0),
        graph.poses,
        graph.confidence,
        jnp.float32(1e-4),
        jnp.zeros((), bool),
    )
    _, poses, conf, _, _ = jax.lax.while_loop(cond, body, init)

    # prune weak loop closures (cpp second pass)
    g = dataclasses.replace(graph, poses=poses)
    keep = g.edge_valid & (~g.uncertain | (conf > option.edge_prune_threshold))
    return dataclasses.replace(g, confidence=conf, edge_valid=keep)


def global_optimization_two_pass(
    graph: PoseGraph,
    option: GlobalOptimizationOption = GlobalOptimizationOption(),
    criteria: GlobalOptimizationConvergenceCriteria = GlobalOptimizationConvergenceCriteria(),
    mesh=None,
    mesh_axis: str = "edges",
) -> PoseGraph:
    """Optimize, prune invalid loop closures, optimize again
    (ref: GlobalOptimization.cpp GlobalOptimization + pruning pass)."""
    g1 = global_optimization(graph, option, criteria, mesh=mesh, mesh_axis=mesh_axis)
    return global_optimization(g1, option, criteria, mesh=mesh, mesh_axis=mesh_axis)


# ---------------------------------------------------------------------------
# JSON IO (schema-compatible with io/PoseGraphIO.cpp)
# ---------------------------------------------------------------------------


def to_json_dict(graph: PoseGraph) -> dict:
    """Open3D-style pose-graph JSON (ref: io/PoseGraphIO.cpp — class_name
    PoseGraph, nodes[{pose}], edges[{source_node_id, target_node_id,
    transformation, information, uncertain, confidence}])."""
    ev = np.asarray(graph.edge_valid)
    nodes = [
        {"class_name": "PoseGraphNode", "pose": np.asarray(p, np.float64).flatten(order="F").tolist()}
        for p in np.asarray(graph.poses)
    ]
    edges = []
    for e in range(graph.edges.shape[0]):
        if not ev[e]:
            continue
        edges.append(
            {
                "class_name": "PoseGraphEdge",
                "source_node_id": int(graph.edges[e, 0]),
                "target_node_id": int(graph.edges[e, 1]),
                "transformation": np.asarray(graph.transformations[e], np.float64).flatten(order="F").tolist(),
                "information": np.asarray(graph.informations[e], np.float64).flatten(order="F").tolist(),
                "uncertain": bool(graph.uncertain[e]),
                "confidence": float(graph.confidence[e]),
            }
        )
    return {"class_name": "PoseGraph", "version_major": 1, "version_minor": 0, "nodes": nodes, "edges": edges}


def from_json_dict(d: dict) -> PoseGraph:
    poses = np.stack(
        [np.asarray(n["pose"], np.float32).reshape(4, 4, order="F") for n in d["nodes"]]
    )
    E = len(d["edges"])
    edges = np.zeros((max(E, 1), 2), np.int32)
    trans = np.tile(np.eye(4, dtype=np.float32), (max(E, 1), 1, 1))
    infos = np.tile(np.eye(6, dtype=np.float32), (max(E, 1), 1, 1))
    unc = np.zeros((max(E, 1),), bool)
    valid = np.zeros((max(E, 1),), bool)
    conf = np.ones((max(E, 1),), np.float32)
    for i, e in enumerate(d["edges"]):
        edges[i] = (e["source_node_id"], e["target_node_id"])
        trans[i] = np.asarray(e["transformation"], np.float32).reshape(4, 4, order="F")
        infos[i] = np.asarray(e["information"], np.float32).reshape(6, 6, order="F")
        unc[i] = bool(e.get("uncertain", False))
        conf[i] = float(e.get("confidence", 1.0))
        valid[i] = True
    return PoseGraph(
        poses=jnp.asarray(poses),
        edges=jnp.asarray(edges),
        transformations=jnp.asarray(trans),
        informations=jnp.asarray(infos),
        uncertain=jnp.asarray(unc),
        confidence=jnp.asarray(conf),
        edge_valid=jnp.asarray(valid),
    )


def write_pose_graph(path: str, graph: PoseGraph) -> None:
    with open(path, "w") as f:
        json.dump(to_json_dict(graph), f, indent=1)


def read_pose_graph(path: str) -> PoseGraph:
    with open(path) as f:
        return from_json_dict(json.load(f))
