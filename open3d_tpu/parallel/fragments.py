"""Distributed multiway fragment alignment over a TPU device mesh.

The reference scales its reconstruction system with a multiprocessing.Pool
over fragments / fragment pairs (examples/python/reconstruction_system/
make_fragments.py:180-186, register_fragments.py:167-171) and has NO
device-parallel layer at all (SURVEY.md §2.13). This module is the TPU-native
replacement: a 2-D `jax.sharding.Mesh`

    ("edges", "points")

where pose-graph edges (fragment pairs) are data-parallel across the "edges"
axis and each edge's correspondence/Jacobian work is sharded across the
"points" axis (the sequence-parallel analog). The global Gauss-Newton system
over all fragment poses is assembled with `psum` collectives riding ICI —
the TPU equivalent of the reference's process-pool gather.

The math per edge matches the single-device ICP point-to-plane estimator
(t/pipelines/kernel/RegistrationImpl.h ComputePosePointToPlane), but the
unknowns are ALL fragment poses jointly: residual
    r = n_t . (T_s p_s - T_t q_t)
with Jacobians w.r.t. xi_s = [+(T_s p) x n, n] and xi_t = -[(T_t q) x n, n]
(left-multiplied se(3) perturbations), accumulated into the (6F, 6F) normal
matrix. One step = one GN iteration; drivers loop it (it jits cleanly).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from open3d_tpu.core import lie, nns


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """2-D ("edges", "points") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    pts = 2 if n % 2 == 0 else 1
    import numpy as np

    return Mesh(np.asarray(devices).reshape(n // pts, pts), ("edges", "points"))


def _edge_system(src_pos, src_nrm_unused, src_valid, tgt_pos, tgt_nrm, tgt_mask, T_s, T_t, dmax):
    """Point-to-plane JtJ/Jtr blocks for one edge over a CHUNK of source
    points. Returns (H_ss, H_st, H_tt, b_s, b_t, n_inlier, sq_err)."""
    p = lie.transform_points(T_s, src_pos)
    q_all = lie.transform_points(T_t, tgt_pos)
    idx, d2 = nns.one_nn_search(p, q_all, target_mask=tgt_mask)
    valid = src_valid & (idx >= 0) & (d2 <= dmax * dmax)
    idx = jnp.maximum(idx, 0)
    q = q_all[idx]
    n = lie.rotate_vectors(T_t, tgt_nrm[idx])

    r = jnp.sum((p - q) * n, axis=-1)
    w = valid.astype(jnp.float32)
    J_s = jnp.concatenate([jnp.cross(p, n), n], axis=-1)  # (N, 6)
    J_t = -jnp.concatenate([jnp.cross(q, n), n], axis=-1)

    Jw_s = J_s * w[:, None]
    Jw_t = J_t * w[:, None]
    H_ss = Jw_s.T @ J_s
    H_st = Jw_s.T @ J_t
    H_tt = Jw_t.T @ J_t
    b_s = Jw_s.T @ r
    b_t = Jw_t.T @ r
    return H_ss, H_st, H_tt, b_s, b_t, jnp.sum(w), jnp.sum(w * r * r)


def _assemble_and_solve(H_blocks, b_blocks, counts, sq_errs, edges, n_frags, damping, anchor_first):
    """Scatter per-edge 6x6 blocks into the dense (6F, 6F) system and solve.
    Runs replicated on every device (F is small: #fragments)."""
    F6 = 6 * n_frags
    H = jnp.zeros((F6, F6), jnp.float32)
    b = jnp.zeros((F6,), jnp.float32)
    H_ss, H_st, H_tt = H_blocks
    b_s, b_t = b_blocks
    s_idx, t_idx = edges[:, 0], edges[:, 1]

    def scatter_block(H, rows_frag, cols_frag, blocks):
        r0 = rows_frag * 6
        c0 = cols_frag * 6
        ii = r0[:, None, None] + jnp.arange(6)[None, :, None]
        jj = c0[:, None, None] + jnp.arange(6)[None, None, :]
        return H.at[ii, jj].add(blocks)

    H = scatter_block(H, s_idx, s_idx, H_ss)
    H = scatter_block(H, s_idx, t_idx, H_st)
    H = scatter_block(H, t_idx, s_idx, jnp.swapaxes(H_st, -1, -2))
    H = scatter_block(H, t_idx, t_idx, H_tt)
    bi = s_idx[:, None] * 6 + jnp.arange(6)[None, :]
    b = b.at[bi].add(b_s)
    bj = t_idx[:, None] * 6 + jnp.arange(6)[None, :]
    b = b.at[bj].add(b_t)

    if anchor_first:  # gauge-fix fragment 0 (reference_node convention)
        big = 1e12
        H = H.at[jnp.arange(6), jnp.arange(6)].add(big)

    H = H + damping * jnp.eye(F6, dtype=jnp.float32)
    xi = jnp.linalg.solve(H, -b)  # small dense: F fragments -> 6F x 6F
    return xi.reshape(n_frags, 6), jnp.sum(counts), jnp.sum(sq_errs)


def multiway_gn_step(
    frag_pos: jnp.ndarray,  # (F, N, 3)
    frag_nrm: jnp.ndarray,  # (F, N, 3)
    frag_mask: jnp.ndarray,  # (F, N) bool
    poses: jnp.ndarray,  # (F, 4, 4) fragment -> world
    edges: jnp.ndarray,  # (E, 2) int32 (src_frag, tgt_frag)
    edge_valid: jnp.ndarray,  # (E,) bool
    max_correspondence_distance: float,
    mesh: Optional[Mesh] = None,
    damping: float = 1e-4,
    anchor_first: bool = True,
):
    """One joint Gauss-Newton step over all fragment poses.

    With `mesh`: edges sharded over mesh axis "edges", source points of each
    edge sharded over "points"; partial JtJ blocks are psum-reduced over
    "points", edge blocks all-gathered over "edges", and the global solve +
    pose update runs replicated. Without `mesh`: same math single-device.

    Returns (new_poses (F,4,4), rmse scalar, n_inliers scalar).

    Edge count and point count need NOT divide the mesh axes: edges are
    padded with valid=False rows and the per-fragment point axis is padded
    with masked-out points before sharding (the padding contributes zero to
    every psum).
    """
    F = frag_pos.shape[0]

    if mesh is not None:
        ne = mesh.shape["edges"]
        npts = mesh.shape["points"]
        E = edges.shape[0]
        if E % ne:
            pad = ne - E % ne
            edges = jnp.concatenate([edges, jnp.zeros((pad, 2), edges.dtype)])
            edge_valid = jnp.concatenate([edge_valid, jnp.zeros((pad,), bool)])
        N = frag_pos.shape[1]
        if N % npts:
            pad = npts - N % npts
            frag_pos = jnp.concatenate(
                [frag_pos, jnp.zeros((F, pad, 3), frag_pos.dtype)], axis=1
            )
            frag_nrm = jnp.concatenate(
                [frag_nrm, jnp.zeros((F, pad, 3), frag_nrm.dtype)], axis=1
            )
            frag_mask = jnp.concatenate(
                [frag_mask, jnp.zeros((F, pad), bool)], axis=1
            )

    def edge_fn(e, ev, pos_chunk, nrm_chunk_unused, mask_chunk, tgt_pos, tgt_nrm, tgt_mask, poses):
        s, t = e[0], e[1]
        out = _edge_system(
            pos_chunk,
            None,
            mask_chunk & ev,
            tgt_pos,
            tgt_nrm,
            tgt_mask,
            poses[s],
            poses[t],
            max_correspondence_distance,
        )
        return out

    if mesh is None:
        outs = jax.vmap(
            lambda e, ev: edge_fn(
                e, ev, frag_pos[e[0]], None, frag_mask[e[0]],
                frag_pos[e[1]], frag_nrm[e[1]], frag_mask[e[1]], poses,
            )
        )(edges, edge_valid)
        H_ss, H_st, H_tt, b_s, b_t, cnt, sq = outs
        xi, n_in, sq_sum = _assemble_and_solve(
            (H_ss, H_st, H_tt), (b_s, b_t), cnt, sq, edges, F, damping, anchor_first
        )
        new_poses = jax.vmap(lambda x, T: lie.se3_exp(x) @ T)(xi, poses)
        rmse = jnp.sqrt(sq_sum / jnp.maximum(n_in, 1.0))
        return new_poses, rmse, n_in

    # ---- sharded path ----
    def sharded(edges_l, edge_valid_l, frag_pos_r, frag_nrm_r, frag_mask_r, poses_r):
        # edges_l: (E_local, 2); the points axis shards each edge's SOURCE
        # point chunk: this device handles rows [pid*chunk, (pid+1)*chunk).
        pid = jax.lax.axis_index("points")
        npts = mesh.shape["points"]  # static
        N = frag_pos_r.shape[1]
        chunk = N // npts

        def one_edge(e, ev):
            src_pos = jax.lax.dynamic_slice(
                frag_pos_r[e[0]], (pid * chunk, 0), (chunk, 3)
            )
            src_mask = jax.lax.dynamic_slice(frag_mask_r[e[0]], (pid * chunk,), (chunk,))
            return edge_fn(
                e, ev, src_pos, None, src_mask,
                frag_pos_r[e[1]], frag_nrm_r[e[1]], frag_mask_r[e[1]], poses_r,
            )

        outs = jax.vmap(one_edge)(edges_l, edge_valid_l)
        # combine partial point-chunk systems per edge
        outs = jax.tree.map(lambda x: jax.lax.psum(x, "points"), outs)
        # gather all edges' blocks for the replicated global solve
        outs = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "edges", axis=0, tiled=True), outs
        )
        edges_all = jax.lax.all_gather(edges_l, "edges", axis=0, tiled=True)
        H_ss, H_st, H_tt, b_s, b_t, cnt, sq = outs
        xi, n_in, sq_sum = _assemble_and_solve(
            (H_ss, H_st, H_tt), (b_s, b_t), cnt, sq, edges_all, F, damping, anchor_first
        )
        new_poses = jax.vmap(lambda x, T: lie.se3_exp(x) @ T)(xi, poses_r)
        rmse = jnp.sqrt(sq_sum / jnp.maximum(n_in, 1.0))
        return new_poses, rmse, n_in

    fn = jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P("edges"), P("edges"), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(edges, edge_valid, frag_pos, frag_nrm, frag_mask, poses)


def multiway_align(
    frag_pos, frag_nrm, frag_mask, poses, edges, edge_valid,
    max_correspondence_distance: float,
    n_iterations: int = 10,
    mesh: Optional[Mesh] = None,
    **kw,
):
    """Iterated joint GN (host loop; each step jits and reuses the cache)."""
    step = jax.jit(
        partial(
            multiway_gn_step,
            max_correspondence_distance=max_correspondence_distance,
            mesh=mesh,
            **kw,
        )
    )
    rmse = jnp.zeros(())
    n_in = jnp.zeros(())
    for _ in range(n_iterations):
        poses, rmse, n_in = step(frag_pos, frag_nrm, frag_mask, poses, edges, edge_valid)
    return poses, rmse, n_in
