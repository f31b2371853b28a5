"""SLAC: Simultaneous Localization and Calibration (non-rigid multiway
alignment over a deformable control grid).

Reference: t/pipelines/slac/ — ControlGrid.h:30 (hashmap-backed deformation
grid: keys = Int32x3 cell coords, values = deformed Float32x3 positions;
Touch/Parameterize/Deform/GetNeighborGridMap), SLACOptimizer.h:152
(RunSLACOptimizerForFragments) / :166 (RunRigidOptimizerForFragments),
params SLACOptimizerParams (max_iterations 5, voxel_size 0.05,
distance_threshold 0.07, fitness_threshold 0.3, regularizer_weight 1;
control-grid resolution fixed at 0.375 m). Papers: Zhou-Koltun CVPR'14
(SLAC), vladlen.info/papers/elastic-fragments.pdf.

TPU design:
- ControlGrid reuses core/hashmap (fixed capacity, scatter-min claim
  activate); values live in a dense (C+1, 3) position buffer whose row
  index IS the hash slot, row C = miss.
- Parameterize = one vectorized 8-corner find + trilinear ratios;
  Deform = one gather + weighted sum. No per-point loops.
- The optimizer ALTERNATES (documented divergence: the reference solves the
  joint pose+grid system):
    rigid step   — Gauss-Newton on all fragment poses over all pairwise
                   point-to-plane correspondences (dense 6F solve, F small);
    non-rigid step — Gauss-Newton on grid positions with poses fixed:
                   data term through the trilinear embedding + the
                   elastic-fragments rigidity regularizer
                   || (x_b - x_a) - R_a (init_b - init_a) ||^2 with R_a
                   re-estimated per outer iteration by per-cell Procrustes;
                   solved matrix-free by diagonal-preconditioned CG
                   (the Hessian is 8-corner block sparse).
- Correspondences use fixed-capacity buffers + masks (static shapes).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.core import hashmap as hm
from open3d_tpu.core import lie
from open3d_tpu.geometry.pointcloud import PointCloud
from open3d_tpu.pipelines import pose_graph as pg_mod

GRID_SIZE_DEFAULT = 0.375  # fixed in the reference (SLACOptimizer.h:29)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["table", "positions"],
    meta_fields=["grid_size"],
)
@dataclasses.dataclass(frozen=True)
class ControlGrid:
    """(ref: slac/ControlGrid.h:30). positions row C (capacity) = miss row."""

    table: jnp.ndarray  # (C, 2) packed cell keys
    positions: jnp.ndarray  # (C + 1, 3) f32 current (deformed) positions
    grid_size: float

    @property
    def capacity(self) -> int:
        return self.table.shape[0]

    def init_positions(self) -> jnp.ndarray:
        """Original (undeformed) cell positions from the keys (C, 3)."""
        return hm.unpack_coords(self.table).astype(jnp.float32) * self.grid_size

    def size(self) -> jnp.ndarray:
        return jnp.sum(hm.occupied_mask(self.table).astype(jnp.int32))


def create_control_grid(grid_size: float = GRID_SIZE_DEFAULT, capacity: int = 4096) -> ControlGrid:
    return ControlGrid(
        table=hm.make_table(capacity),
        positions=jnp.zeros((capacity + 1, 3), jnp.float32),
        grid_size=float(grid_size),
    )


_CORNERS = jnp.asarray(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], jnp.int32
)
_NB6 = jnp.asarray(
    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.int32
)


def touch(cg: ControlGrid, points: jnp.ndarray, mask=None) -> ControlGrid:
    """Activate the 8 surrounding cells of every point (ref: ControlGrid::
    Touch) and initialize their positions to the undeformed cell centers."""
    g = points / cg.grid_size
    g0 = jnp.floor(g).astype(jnp.int32)
    cells = (g0[:, None, :] + _CORNERS[None, :, :]).reshape(-1, 3)
    keys = hm.pack_coords(cells)
    if mask is not None:
        keys = jnp.where(jnp.repeat(mask, 8)[:, None], keys, 0)
    keys, _ = hm.unique_keys(keys, min(cg.capacity, keys.shape[0]))
    _, was_there = hm.find(cg.table, keys)
    table, slot, ok = hm.activate(cg.table, keys)
    # write init positions ONLY for newly activated cells — re-touching an
    # already-optimized cell must not reset its deformation
    pos = hm.unpack_coords(keys).astype(jnp.float32) * cg.grid_size
    rows = jnp.where(ok & ~was_there, slot, cg.capacity)
    positions = cg.positions.at[rows].set(pos).at[cg.capacity].set(0.0)
    return dataclasses.replace(cg, table=table, positions=positions)


class Parameterized(NamedTuple):
    """(ref: ControlGrid::Parameterize — kGrid8NbIndices / InterpRatios)"""

    rows: jnp.ndarray  # (N, 8) int32 control-point buffer rows (C = miss)
    ratios: jnp.ndarray  # (N, 8) f32 trilinear weights
    valid: jnp.ndarray  # (N,) bool — all 8 corners resolved


def parameterize(cg: ControlGrid, points: jnp.ndarray) -> Parameterized:
    g = points / cg.grid_size
    g0 = jnp.floor(g).astype(jnp.int32)
    f = g - g0.astype(jnp.float32)
    cells = g0[:, None, :] + _CORNERS[None, :, :]  # (N, 8, 3)
    slot, found = hm.find(cg.table, hm.pack_coords(cells.reshape(-1, 3)))
    rows = jnp.where(found, slot, cg.capacity).reshape(points.shape[0], 8)
    w = jnp.stack(
        [
            jnp.prod(
                jnp.where(_CORNERS[c][None, :] == 1, f, 1.0 - f), axis=-1
            )
            for c in range(8)
        ],
        axis=-1,
    )
    valid = jnp.all(found.reshape(points.shape[0], 8), axis=-1)
    return Parameterized(rows=rows, ratios=w, valid=valid)


def deform_points(cg: ControlGrid, param: Parameterized) -> jnp.ndarray:
    """(ref: ControlGrid::Deform, ControlGrid.cpp:241-287)"""
    corners = cg.positions[param.rows]  # (N, 8, 3)
    return jnp.sum(corners * param.ratios[..., None], axis=1)


def neighbor_grid_map(cg: ControlGrid, capacity: Optional[int] = None):
    """6-neighbor map over active cells (ref: GetNeighborGridMap).
    Returns (rows (A,), nb_rows (A, 6), nb_mask (A, 6), count)."""
    A = capacity or cg.capacity
    slots, count = hm.active_slots(cg.table, A)
    live = jnp.arange(A) < count
    coords = hm.unpack_coords(cg.table[jnp.maximum(slots, 0)])
    nb = coords[:, None, :] + _NB6[None, :, :]
    nb_slot, nb_found = hm.find(cg.table, hm.pack_coords(nb.reshape(-1, 3)))
    nb_rows = jnp.where(nb_found, nb_slot, cg.capacity).reshape(A, 6)
    nb_mask = nb_found.reshape(A, 6) & live[:, None]
    return jnp.where(live, slots, cg.capacity), nb_rows, nb_mask, count


# ---------------------------------------------------------------------------
# Optimizers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SLACOptimizerParams:
    """(ref: SLACOptimizerParams, SLACOptimizer.h:24-90 — same knob names)"""

    max_iterations: int = 5
    voxel_size: float = 0.05
    distance_threshold: float = 0.07
    fitness_threshold: float = 0.3
    regularizer_weight: float = 1.0
    grid_size: float = GRID_SIZE_DEFAULT
    grid_capacity: int = 4096
    corres_capacity: int = 4096
    # rigid pose passes before the non-rigid loop (0 = poses already
    # optimized, e.g. by global pose-graph optimization — the reference's
    # intended input state for RunSLACOptimizerForFragments)
    rigid_iterations: int = 1


class _EdgeCorres(NamedTuple):
    src_frag: int
    tgt_frag: int
    src_idx: jnp.ndarray  # (K,) into source fragment points
    tgt_idx: jnp.ndarray  # (K,)
    valid: jnp.ndarray  # (K,) bool


def _find_correspondences(fragments, graph: pg_mod.PoseGraph, params) -> List[_EdgeCorres]:
    """Per valid edge: nearest-neighbor correspondences between the two
    fragments in the CURRENT world frame (ref: SaveCorrespondencesForPoint-
    Clouds, SLACOptimizer.h:136 — computed once and reused; here recomputed
    per call, a TPU-side simplification)."""
    from open3d_tpu.core import nns

    out = []
    edges = np.asarray(graph.edges)
    ev = np.asarray(graph.edge_valid)
    poses = graph.poses
    K = params.corres_capacity
    for e in range(edges.shape[0]):
        if not ev[e]:
            continue
        i, j = int(edges[e, 0]), int(edges[e, 1])
        ps = lie.transform_points(poses[i], fragments[i].positions)
        pt = lie.transform_points(poses[j], fragments[j].positions)
        idx, d2, cnt = nns.hybrid_search(ps, pt, params.distance_threshold, 1)
        idx = idx[:, 0]
        ok = (idx >= 0) & fragments[i].mask
        # cap to K with a deterministic compaction
        from open3d_tpu.core.masking import compact_indices

        sidx, c = compact_indices(ok, K)
        live = jnp.arange(K) < c
        out.append(
            _EdgeCorres(
                src_frag=i,
                tgt_frag=j,
                src_idx=jnp.where(live, jnp.maximum(sidx, 0), 0),
                tgt_idx=jnp.where(live, idx[jnp.maximum(sidx, 0)], 0),
                valid=live,
            )
        )
    return out


def run_rigid_optimizer_for_fragments(
    fragments: List[PointCloud],
    graph: pg_mod.PoseGraph,
    params: SLACOptimizerParams = SLACOptimizerParams(),
) -> pg_mod.PoseGraph:
    """Joint multiway dense point-to-plane refinement of fragment poses
    (ref: RunRigidOptimizerForFragments, SLACOptimizer.h:166)."""
    F = graph.poses.shape[0]
    poses = graph.poses
    for _ in range(params.max_iterations):
        corres = _find_correspondences(fragments, dataclasses.replace(graph, poses=poses), params)
        H = jnp.zeros((F, F, 6, 6), jnp.float32)
        b = jnp.zeros((F, 6), jnp.float32)
        for ec in corres:
            i, j = ec.src_frag, ec.tgt_frag
            p = lie.transform_points(poses[i], fragments[i].positions[ec.src_idx])
            q = lie.transform_points(poses[j], fragments[j].positions[ec.tgt_idx])
            nrm = fragments[j].attrs["normals"][ec.tgt_idx] @ poses[j][:3, :3].T
            r = jnp.sum((p - q) * nrm, axis=-1)
            w = ec.valid.astype(jnp.float32)
            Ji = jnp.concatenate([jnp.cross(p, nrm), nrm], axis=-1)  # (K, 6)
            Jj = -Ji
            H = H.at[i, i].add(jnp.einsum("ka,kb,k->ab", Ji, Ji, w))
            H = H.at[i, j].add(jnp.einsum("ka,kb,k->ab", Ji, Jj, w))
            H = H.at[j, i].add(jnp.einsum("ka,kb,k->ab", Jj, Ji, w))
            H = H.at[j, j].add(jnp.einsum("ka,kb,k->ab", Jj, Jj, w))
            b = b.at[i].add(jnp.einsum("ka,k,k->a", Ji, r, w))
            b = b.at[j].add(jnp.einsum("ka,k,k->a", Jj, r, w))
        dx = pg_mod._solve(H, b, jnp.float32(1e-6), 0)
        poses = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dx, poses)
    return dataclasses.replace(graph, poses=poses)


def _estimate_cell_rotations(cg: ControlGrid, rows, nb_rows, nb_mask):
    """Per-cell Procrustes R_a aligning init neighbor offsets to current
    ones (the elastic-fragments rigidity term's rotation estimate)."""
    init = jnp.concatenate(
        [hm.unpack_coords(cg.table).astype(jnp.float32) * cg.grid_size,
         jnp.zeros((1, 3), jnp.float32)]
    )
    curr = cg.positions
    a_init = init[jnp.minimum(rows, cg.capacity)]
    a_curr = curr[jnp.minimum(rows, cg.capacity)]
    d_init = init[nb_rows] - a_init[:, None, :]  # (A, 6, 3)
    d_curr = curr[nb_rows] - a_curr[:, None, :]
    m = nb_mask[..., None].astype(jnp.float32)
    M = jnp.einsum("aki,akj->aij", d_curr * m, d_init * m)
    U, _, Vt = jnp.linalg.svd(M + 1e-8 * jnp.eye(3))
    det = jnp.linalg.det(U @ Vt)
    S = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return U @ (S[:, :, None] * Vt)  # (A, 3, 3)


def run_slac_optimizer_for_fragments(
    fragments: List[PointCloud],
    graph: pg_mod.PoseGraph,
    params: SLACOptimizerParams = SLACOptimizerParams(),
    n_cg: int = 48,
) -> Tuple[pg_mod.PoseGraph, ControlGrid]:
    """Alternating SLAC (ref: RunSLACOptimizerForFragments,
    SLACOptimizer.h:152): rigid pose refinement, then non-rigid control-grid
    refinement with the rigidity regularizer, repeated max_iterations times.
    Fragment point clouds are given in FRAGMENT-LOCAL coordinates.

    The control grid lives in the SHARED CAMERA (fragment-local) space — the
    reference's ControlGrid::Touch takes local clouds ("allocate control
    grids in the shared camera space"): the deformation models a systematic
    sensor calibration distortion applied BEFORE each fragment's pose, so
    the residual is r = n . (T_i D(p_local) - T_j D(q_local)). Deforming
    world-frame points instead would cancel in the residual (both endpoints
    of a correspondence share cells) and could never straighten anything."""
    C = params.grid_capacity
    cg = create_control_grid(params.grid_size, C)
    for pc in fragments:
        cg = touch(cg, pc.positions, pc.mask)

    # Rigid refinement BEFORE the non-rigid loop only: on distorted
    # fragments a repeated rigid step trades calibration error for pose
    # error (tilting poses to hide the bend), which the grid then bakes in.
    # The reference avoids this by solving poses+grid jointly; with the
    # alternating scheme, poses are refined up front and then held.
    if params.rigid_iterations > 0:
        graph = run_rigid_optimizer_for_fragments(
            fragments,
            graph,
            dataclasses.replace(params, max_iterations=params.rigid_iterations),
        )

    for outer in range(params.max_iterations):

        # ---- non-rigid step: optimize grid positions, poses fixed ----
        corres = _find_correspondences(fragments, graph, params)
        rows_a, nb_rows, nb_mask, _ = neighbor_grid_map(cg)
        R = _estimate_cell_rotations(cg, rows_a, nb_rows, nb_mask)
        init_all = jnp.concatenate(
            [cg.init_positions(), jnp.zeros((1, 3), jnp.float32)]
        )

        # data term: r = n . (T_i D(p_loc) - T_j D(q_loc)); unknown = grid
        # positions. Embed each LOCAL endpoint in the shared grid.
        terms = []
        for ec in corres:
            i, j = ec.src_frag, ec.tgt_frag
            p_l = fragments[i].positions[ec.src_idx]
            q_l = fragments[j].positions[ec.tgt_idx]
            n_w = fragments[j].attrs["normals"][ec.tgt_idx] @ graph.poses[j][:3, :3].T
            pp = parameterize(cg, p_l)
            pq = parameterize(cg, q_l)
            w = (ec.valid & pp.valid & pq.valid).astype(jnp.float32)
            terms.append((pp, pq, n_w, w, graph.poses[i], graph.poses[j]))

        def data_residuals(positions):
            cg2 = dataclasses.replace(cg, positions=positions)
            rs = []
            for pp, pq, n_w, w, Ti, Tj in terms:
                dp = lie.transform_points(Ti, deform_points(cg2, pp))
                dq = lie.transform_points(Tj, deform_points(cg2, pq))
                rs.append((jnp.sum((dp - dq) * n_w, axis=-1), w))
            return rs

        w_reg = jnp.float32(params.regularizer_weight)

        def reg_residuals(positions):
            a_curr = positions[jnp.minimum(rows_a, C)]
            d_curr = positions[nb_rows] - a_curr[:, None, :]
            d_init = init_all[nb_rows] - init_all[jnp.minimum(rows_a, C)][:, None, :]
            target = jnp.einsum("aij,akj->aki", R, d_init)
            r = (d_curr - target) * nb_mask[..., None]
            return r  # (A, 6, 3)

        def grad_and_hv():
            """Matrix-free normal equations via jax linearization."""

            def loss_vec(positions):
                parts = []
                for r, w in data_residuals(positions):
                    parts.append(r * jnp.sqrt(w))
                parts.append(jnp.sqrt(w_reg) * reg_residuals(positions).reshape(-1))
                return jnp.concatenate([p.reshape(-1) for p in parts])

            r0, jvp_lin = jax.linearize(loss_vec, cg.positions)
            vjp = jax.vjp(loss_vec, cg.positions)[1]

            def hv(v):
                return vjp(jvp_lin(v))[0]

            g = vjp(r0)[0]
            return g, hv

        g, hv = grad_and_hv()

        # Jacobi preconditioner: diag(J^T J) estimated by Hutchinson probes
        # diag ~= E[z * (H z)] with Rademacher z (exact in expectation; a few
        # probes suffice for preconditioning). The earlier regularizer-only
        # diagonal mis-scaled the data rows and stalled CG.
        key = jax.random.PRNGKey(0)
        diag_est = jnp.zeros_like(cg.positions)
        n_probe = 8
        for pi in range(n_probe):
            z = jax.random.rademacher(
                jax.random.fold_in(key, pi), cg.positions.shape, jnp.float32
            )
            diag_est = diag_est + z * hv(z)
        diag_est = jnp.maximum(diag_est / n_probe, 1e-4)
        M_inv = 1.0 / diag_est

        x = jnp.zeros_like(cg.positions)
        r = -g - hv(x)
        z = M_inv * r
        p = z
        rz = jnp.sum(r * z)

        def body(k, st):
            x, r, p, rz = st
            Ap = hv(p) + 1e-6 * p
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M_inv * r
            rz2 = jnp.sum(r * z)
            p = z + (rz2 / jnp.maximum(rz, 1e-30)) * p
            return (x, r, p, rz2)

        x, _, _, _ = jax.lax.fori_loop(0, n_cg, body, (x, r, p, rz))
        new_pos = (cg.positions + x).at[C].set(0.0)
        cg = dataclasses.replace(cg, positions=new_pos)

    return graph, cg


def deform_fragment(cg: ControlGrid, graph: pg_mod.PoseGraph, frag_id: int, pc: PointCloud) -> PointCloud:
    """Fragment-local cloud -> calibration-deformed, world-frame cloud
    (deform in the shared camera space, then apply the fragment pose)."""
    param = parameterize(cg, pc.positions)
    warped = jnp.where(
        param.valid[:, None], deform_points(cg, param), pc.positions
    )
    return dataclasses.replace(
        pc, positions=lie.transform_points(graph.poses[frag_id], warped)
    )
