"""Triangle-mesh toolbox ops, TPU-native.

Reference surface (SURVEY.md §2.2 / §2.5):
- SubdivideMidpoint         — geometry/TriangleMeshSubdivide.cpp
- SimplifyVertexClustering  — geometry/TriangleMeshSimplification.cpp
- ClipPlane                 — t/geometry/TriangleMesh.h (ClipPlane)
- RemoveDuplicated/Degenerate — TriangleMesh cleanup family
- FilterSmoothLaplacian/Taubin — geometry/TriangleMesh.cpp filters

All ops keep the fixed-capacity mask idiom: outputs allocate static shapes
(4T for one subdivision level, V for clustering) with validity masks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.geometry.trianglemesh import TriangleMesh

_INT_BIG = jnp.int32(2**30)


def subdivide_midpoint(mesh: TriangleMesh, number_of_iterations: int = 1) -> TriangleMesh:
    """Midpoint (1:4) subdivision (ref: TriangleMesh::SubdivideMidpoint,
    geometry/TriangleMeshSubdivide.cpp). Edge midpoints are deduplicated by
    sorted-edge keys so the result stays watertight where the input was."""
    for _ in range(number_of_iterations):
        v = mesh.vertices
        t = jnp.maximum(mesh.triangles, 0)
        V = v.shape[0]
        T = t.shape[0]
        # unique edges via sorted pairs
        e = jnp.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], 0)  # (3T,2)
        e = jnp.sort(e, axis=1)
        # row-wise unique via one lexicographic lax.sort (no packed scalar
        # key, so V > 46340 cannot overflow int32)
        n3 = e.shape[0]
        s0, s1, perm = jax.lax.sort(
            (e[:, 0], e[:, 1], jnp.arange(n3, dtype=jnp.int32)), num_keys=2
        )
        first = jnp.concatenate(
            [jnp.array([True]), (s0[1:] != s0[:-1]) | (s1[1:] != s1[:-1])]
        )
        gid = jnp.cumsum(first.astype(jnp.int32)) - 1  # group id per sorted row
        inv = jnp.zeros((n3,), jnp.int32).at[perm].set(gid)
        mid_a = jnp.zeros((n3,), jnp.int32).at[gid].set(s0)
        mid_b = jnp.zeros((n3,), jnp.int32).at[gid].set(s1)
        mids = 0.5 * (v[jnp.clip(mid_a, 0, V - 1)] + v[jnp.clip(mid_b, 0, V - 1)])
        new_v = jnp.concatenate([v, mids], 0)  # (V + 3T, 3)
        m01 = V + inv[:T]
        m12 = V + inv[T:2 * T]
        m20 = V + inv[2 * T:]
        t0, t1, t2 = t[:, 0], t[:, 1], t[:, 2]
        new_t = jnp.concatenate(
            [
                jnp.stack([t0, m01, m20], -1),
                jnp.stack([m01, t1, m12], -1),
                jnp.stack([m20, m12, t2], -1),
                jnp.stack([m01, m12, m20], -1),
            ],
            0,
        ).astype(jnp.int32)
        vmask = jnp.concatenate(
            [mesh.vertex_mask, jnp.arange(n3) < jnp.sum(first.astype(jnp.int32))]
        )
        tmask = jnp.tile(mesh.triangle_mask, 4)
        mesh = TriangleMesh.create(new_v, new_t, vertex_mask=vmask, triangle_mask=tmask)
    return mesh


def subdivide_loop(mesh: TriangleMesh, number_of_iterations: int = 1) -> TriangleMesh:
    """Loop (1:4 smoothing) subdivision (ref: TriangleMesh::SubdivideLoop,
    geometry/TriangleMeshSubdivide.cpp). Same sorted-edge-key dedup as
    subdivide_midpoint for the topology; positions follow Loop's masks:
    interior edge points 3/8(a+b) + 1/8(opposites), boundary edge points
    (a+b)/2, interior vertices (1 - n b) v + b sum(neighbors) with
    b = (5/8 - (3/8 + cos(2 pi / n)/4)^2)/n, boundary vertices
    3/4 v + 1/8 (boundary neighbors)."""
    for _ in range(number_of_iterations):
        v = mesh.vertices
        t = jnp.maximum(mesh.triangles, 0)
        tm = mesh.triangle_mask
        V = v.shape[0]
        T = t.shape[0]
        e = jnp.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], 0)
        opp = jnp.concatenate([t[:, 2], t[:, 0], t[:, 1]], 0)  # (3T,)
        live3 = jnp.tile(tm, 3)
        e = jnp.sort(e, axis=1)
        n3 = e.shape[0]
        s0, s1, perm = jax.lax.sort(
            (e[:, 0], e[:, 1], jnp.arange(n3, dtype=jnp.int32)), num_keys=2
        )
        first = jnp.concatenate(
            [jnp.array([True]), (s0[1:] != s0[:-1]) | (s1[1:] != s1[:-1])]
        )
        gid = jnp.cumsum(first.astype(jnp.int32)) - 1
        inv = jnp.zeros((n3,), jnp.int32).at[perm].set(gid)
        ea = jnp.zeros((n3,), jnp.int32).at[gid].set(s0)
        eb = jnp.zeros((n3,), jnp.int32).at[gid].set(s1)
        # per unique edge: live-adjacent-face count + opposite-vertex sum
        wl = live3.astype(jnp.float32)
        cnt = jnp.zeros((n3,), jnp.float32).at[inv].add(wl)
        opp_sum = jnp.zeros((n3, 3), jnp.float32).at[inv].add(
            v[opp] * wl[:, None]
        )
        va = v[jnp.clip(ea, 0, V - 1)]
        vb = v[jnp.clip(eb, 0, V - 1)]
        interior = cnt >= 2.0
        mids = jnp.where(
            interior[:, None],
            0.375 * (va + vb) + 0.125 * opp_sum,
            0.5 * (va + vb),
        )
        edge_live = cnt >= 1.0

        # original-vertex smoothing over the unique live-edge graph
        elw = edge_live.astype(jnp.float32)
        bnd = (cnt == 1.0).astype(jnp.float32)
        nb_sum = (
            jnp.zeros((V, 3), jnp.float32)
            .at[ea].add(vb * elw[:, None])
            .at[eb].add(va * elw[:, None])
        )
        val = (
            jnp.zeros((V,), jnp.float32).at[ea].add(elw).at[eb].add(elw)
        )
        bnd_sum = (
            jnp.zeros((V, 3), jnp.float32)
            .at[ea].add(vb * bnd[:, None])
            .at[eb].add(va * bnd[:, None])
        )
        bnd_cnt = jnp.zeros((V,), jnp.float32).at[ea].add(bnd).at[eb].add(bnd)
        n = jnp.maximum(val, 1.0)
        beta = (0.625 - (0.375 + 0.25 * jnp.cos(2.0 * jnp.pi / n)) ** 2) / n
        v_int = (1.0 - n * beta)[:, None] * v + beta[:, None] * nb_sum
        v_bnd = 0.75 * v + 0.125 * bnd_sum
        v_new = jnp.where((bnd_cnt > 0.0)[:, None], v_bnd, v_int)
        v_new = jnp.where((val > 0.0)[:, None], v_new, v)
        v_new = jnp.where(mesh.vertex_mask[:, None], v_new, v)

        new_v = jnp.concatenate([v_new, mids], 0)
        m01 = V + inv[:T]
        m12 = V + inv[T:2 * T]
        m20 = V + inv[2 * T:]
        t0, t1, t2 = t[:, 0], t[:, 1], t[:, 2]
        new_t = jnp.concatenate(
            [
                jnp.stack([t0, m01, m20], -1),
                jnp.stack([m01, t1, m12], -1),
                jnp.stack([m20, m12, t2], -1),
                jnp.stack([m01, m12, m20], -1),
            ],
            0,
        ).astype(jnp.int32)
        vmask = jnp.concatenate([mesh.vertex_mask, edge_live])
        tmask = jnp.tile(tm, 4)
        mesh = TriangleMesh.create(new_v, new_t, vertex_mask=vmask, triangle_mask=tmask)
    return mesh


def simplify_vertex_clustering(mesh: TriangleMesh, voxel_size: float) -> TriangleMesh:
    """Vertex-clustering simplification (ref:
    TriangleMesh::SimplifyVertexClustering,
    geometry/TriangleMeshSimplification.cpp): vertices snapping to the same
    voxel merge to their mean; degenerate triangles are masked out."""
    v = mesh.vertices
    V = v.shape[0]
    c = jnp.floor(v / voxel_size).astype(jnp.int32)
    c = jnp.where(mesh.vertex_mask[:, None], c, _INT_BIG)
    uniq, inv = jnp.unique(c, axis=0, size=V, fill_value=_INT_BIG, return_inverse=True)
    inv = inv.reshape(-1).astype(jnp.int32)
    w = mesh.vertex_mask.astype(jnp.float32)
    vsum = jax.ops.segment_sum(v * w[:, None], inv, num_segments=V)
    cnt = jax.ops.segment_sum(w, inv, num_segments=V)
    new_v = vsum / jnp.maximum(cnt, 1.0)[:, None]
    new_t = inv[jnp.maximum(mesh.triangles, 0)]
    degen = (
        (new_t[:, 0] == new_t[:, 1])
        | (new_t[:, 1] == new_t[:, 2])
        | (new_t[:, 0] == new_t[:, 2])
    )
    tmask = mesh.triangle_mask & ~degen
    vmask = uniq[:, 0] < _INT_BIG
    return TriangleMesh.create(new_v, new_t, vertex_mask=vmask, triangle_mask=tmask)


def clip_plane(mesh: TriangleMesh, point, normal) -> TriangleMesh:
    """Keep the half-space n.(x-p) >= 0 (ref: t::TriangleMesh::ClipPlane).
    Triangles crossing the plane are masked out (conservative clip; the
    reference re-triangulates the crossing band)."""
    p = jnp.asarray(point, jnp.float32)
    n = jnp.asarray(normal, jnp.float32)
    keep_v = (mesh.vertices - p) @ n >= 0
    t = jnp.maximum(mesh.triangles, 0)
    keep_t = keep_v[t[:, 0]] & keep_v[t[:, 1]] & keep_v[t[:, 2]]
    return TriangleMesh.create(
        mesh.vertices, mesh.triangles,
        vertex_mask=mesh.vertex_mask & keep_v,
        triangle_mask=mesh.triangle_mask & keep_t,
        vertex_attrs=mesh.vertex_attrs, triangle_attrs=mesh.triangle_attrs,
    )


def remove_duplicated_vertices(mesh: TriangleMesh, decimals: int = 6) -> TriangleMesh:
    """Merge bit-identical (rounded) vertices (ref:
    TriangleMesh::RemoveDuplicatedVertices)."""
    v = mesh.vertices
    V = v.shape[0]
    q = jnp.round(v * (10.0**decimals)).astype(jnp.int32)
    q = jnp.where(mesh.vertex_mask[:, None], q, _INT_BIG)
    uniq, inv = jnp.unique(q, axis=0, size=V, fill_value=_INT_BIG, return_inverse=True)
    inv = inv.reshape(-1).astype(jnp.int32)
    # representative = first occurrence (deterministic via segment_min)
    first = jax.ops.segment_min(
        jnp.arange(V, dtype=jnp.int32), inv, num_segments=V
    )
    new_v = v[jnp.clip(first, 0, V - 1)]
    new_t = inv[jnp.maximum(mesh.triangles, 0)]
    return TriangleMesh.create(
        new_v, new_t,
        vertex_mask=uniq[:, 0] < _INT_BIG, triangle_mask=mesh.triangle_mask,
    )


def filter_smooth_laplacian(
    mesh: TriangleMesh, number_of_iterations: int = 1, lambda_filter: float = 0.5,
    max_degree: int = 16,
) -> TriangleMesh:
    """Laplacian smoothing (ref: TriangleMesh::FilterSmoothLaplacian,
    geometry/TriangleMesh.cpp): v += lambda * (mean(neighbors) - v), neighbor
    set from triangle adjacency (segment-mean, static capacity)."""
    t = jnp.maximum(mesh.triangles, 0)
    V = mesh.vertices.shape[0]
    tw = mesh.triangle_mask.astype(jnp.float32)
    src = jnp.concatenate([t[:, 0], t[:, 1], t[:, 2], t[:, 1], t[:, 2], t[:, 0]])
    dst = jnp.concatenate([t[:, 1], t[:, 2], t[:, 0], t[:, 0], t[:, 1], t[:, 2]])
    ew = jnp.tile(tw, 6)
    v = mesh.vertices
    for _ in range(number_of_iterations):
        s = jax.ops.segment_sum(v[dst] * ew[:, None], src, num_segments=V)
        c = jax.ops.segment_sum(ew, src, num_segments=V)
        mean = s / jnp.maximum(c, 1.0)[:, None]
        upd = v + lambda_filter * (mean - v)
        v = jnp.where((c > 0)[:, None] & mesh.vertex_mask[:, None], upd, v)
    return TriangleMesh.create(
        v, mesh.triangles, vertex_mask=mesh.vertex_mask,
        triangle_mask=mesh.triangle_mask, vertex_attrs=mesh.vertex_attrs,
        triangle_attrs=mesh.triangle_attrs,
    )


def filter_smooth_taubin(
    mesh: TriangleMesh, number_of_iterations: int = 1,
    lambda_filter: float = 0.5, mu: float = -0.53,
) -> TriangleMesh:
    """Taubin λ|μ smoothing (ref: TriangleMesh::FilterSmoothTaubin):
    shrink-free alternation of positive and negative Laplacian steps."""
    for _ in range(number_of_iterations):
        mesh = filter_smooth_laplacian(mesh, 1, lambda_filter)
        mesh = filter_smooth_laplacian(mesh, 1, mu)
    return mesh


# ---------------------------------------------------------------------------
# Selection / cleanup
# ---------------------------------------------------------------------------


def select_by_mask(mesh: TriangleMesh, vertex_mask: jnp.ndarray) -> TriangleMesh:
    """Keep the masked vertices and every triangle whose 3 vertices survive
    (ref: TriangleMesh::SelectByIndex, t/geometry/TriangleMesh.cpp — the
    boolean-mask formulation of the index list; shapes stay static)."""
    keep_v = mesh.vertex_mask & vertex_mask
    t = jnp.maximum(mesh.triangles, 0)
    keep_t = mesh.triangle_mask & keep_v[t[:, 0]] & keep_v[t[:, 1]] & keep_v[t[:, 2]]
    return TriangleMesh.create(
        mesh.vertices, mesh.triangles, vertex_mask=keep_v, triangle_mask=keep_t
    )


def select_by_index(mesh: TriangleMesh, indices) -> TriangleMesh:
    """(ref: TriangleMesh::SelectByIndex) — index-list wrapper."""
    vm = jnp.zeros((mesh.vertices.shape[0],), bool).at[jnp.asarray(indices)].set(True)
    return select_by_mask(mesh, vm)


def remove_degenerate_triangles(mesh: TriangleMesh) -> TriangleMesh:
    """Mask out triangles with repeated vertex ids or ~zero area
    (ref: TriangleMesh::RemoveDegenerateTriangles)."""
    t = jnp.maximum(mesh.triangles, 0)
    distinct = (t[:, 0] != t[:, 1]) & (t[:, 1] != t[:, 2]) & (t[:, 0] != t[:, 2])
    a = mesh.vertices[t[:, 0]]
    b = mesh.vertices[t[:, 1]]
    c = mesh.vertices[t[:, 2]]
    area2 = jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)
    ok = mesh.triangle_mask & distinct & (area2 > 1e-14)
    return TriangleMesh.create(
        mesh.vertices, mesh.triangles, vertex_mask=mesh.vertex_mask, triangle_mask=ok
    )


def remove_unreferenced_vertices(mesh: TriangleMesh) -> TriangleMesh:
    """(ref: TriangleMesh::RemoveUnreferencedVertices)"""
    t = jnp.maximum(mesh.triangles, 0)
    V = mesh.vertices.shape[0]
    used = (
        jnp.zeros((V,), bool)
        .at[jnp.where(mesh.triangle_mask[:, None], t, 0)]
        .set(True)
    )
    # vertex 0 may be incorrectly marked by masked-out scatter rows
    used = used.at[0].set(
        jnp.any(mesh.triangle_mask & jnp.any(t == 0, axis=1))
    )
    return TriangleMesh.create(
        mesh.vertices,
        mesh.triangles,
        vertex_mask=mesh.vertex_mask & used,
        triangle_mask=mesh.triangle_mask,
    )


# ---------------------------------------------------------------------------
# Quadric-error decimation
# ---------------------------------------------------------------------------


def simplify_quadric_decimation(
    mesh: TriangleMesh,
    target_number_of_triangles: int,
    max_rounds: int = 24,
) -> TriangleMesh:
    """Quadric-error-metric mesh simplification
    (ref: TriangleMesh::SimplifyQuadricDecimation,
    geometry/TriangleMeshSimplification.cpp — Garland-Heckbert).

    TPU design: instead of the reference's sequential min-heap of edge
    collapses, each round collapses a maximal INDEPENDENT SET of low-cost
    edges simultaneously: per-vertex quadrics are scatter-added from face
    plane quadrics, every live edge is scored with its midpoint quadric
    error, each vertex gives itself to its cheapest incident edge
    (scatter-min claim), and edges winning BOTH endpoints collapse in one
    vectorized pass. Rounds are gated so the triangle count converges onto
    the target from above.
    """
    v = mesh.vertices
    t = jnp.maximum(mesh.triangles, 0)
    V = v.shape[0]
    vmask = mesh.vertex_mask
    tmask = mesh.triangle_mask
    target = jnp.int32(target_number_of_triangles)

    def one_round(v, vmask, tmask, t):
        n_live = jnp.sum(tmask.astype(jnp.int32))
        active = n_live > target

        a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
        n = jnp.cross(b - a, c - a)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        d = -jnp.sum(n * a, axis=-1)
        plane = jnp.concatenate([n, d[:, None]], axis=-1)  # (T, 4)
        K = plane[:, :, None] * plane[:, None, :]  # (T, 4, 4)
        K = jnp.where(tmask[:, None, None], K, 0.0)
        Q = jnp.zeros((V, 4, 4), jnp.float32)
        for k in range(3):
            Q = Q.at[t[:, k]].add(K)

        # candidate edges (3T, 2), sorted ids; only live-triangle edges
        e = jnp.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], 0)
        e = jnp.sort(e, axis=1)
        e_live = jnp.tile(tmask, 3) & (e[:, 0] != e[:, 1])
        vbar = 0.5 * (v[e[:, 0]] + v[e[:, 1]])
        vb4 = jnp.concatenate([vbar, jnp.ones((e.shape[0], 1))], axis=-1)
        Qe = Q[e[:, 0]] + Q[e[:, 1]]
        cost = jnp.einsum("ni,nij,nj->n", vb4, Qe, vb4)
        cost = jnp.where(e_live, cost, jnp.inf)

        # claim: each endpoint points at its cheapest incident edge (rank
        # of the edge in ascending-cost order breaks ties deterministically)
        n3 = e.shape[0]
        order = jnp.argsort(cost)
        rank = jnp.zeros((n3,), jnp.int32).at[order].set(
            jnp.arange(n3, dtype=jnp.int32)
        )
        BIG = jnp.int32(2**30)
        rank = jnp.where(e_live, rank, BIG)
        claim = jnp.full((V,), BIG, jnp.int32)
        claim = claim.at[e[:, 0]].min(rank)
        claim = claim.at[e[:, 1]].min(rank)
        win = active & e_live & (claim[e[:, 0]] == rank) & (claim[e[:, 1]] == rank)
        # cap winners so the count never undershoots the target badly:
        # each collapse removes ~2 triangles
        quota = jnp.maximum((n_live - target) // 2, 1)
        nwin_before = jnp.cumsum(win.astype(jnp.int32)) - win.astype(jnp.int32)
        win = win & (nwin_before < quota)

        # collapse: b -> a, a moves to the quadric midpoint
        parent = jnp.arange(V, dtype=jnp.int32)
        parent = parent.at[jnp.where(win, e[:, 1], V)].set(e[:, 0], mode="drop")
        v = v.at[jnp.where(win, e[:, 0], V)].set(vbar, mode="drop")
        gone = jnp.zeros((V,), bool).at[jnp.where(win, e[:, 1], V)].set(
            True, mode="drop"
        )
        vmask = vmask & ~gone
        t = parent[t]
        degen = (t[:, 0] == t[:, 1]) | (t[:, 1] == t[:, 2]) | (t[:, 0] == t[:, 2])
        tmask = tmask & ~degen
        return v, vmask, tmask, t

    for _ in range(max_rounds):
        v, vmask, tmask, t = one_round(v, vmask, tmask, t)
    return TriangleMesh.create(v, t, vertex_mask=vmask, triangle_mask=tmask)


# ---------------------------------------------------------------------------
# Hole filling
# ---------------------------------------------------------------------------


def fill_holes(mesh: TriangleMesh, hole_size: int = 128) -> TriangleMesh:
    """Close boundary loops with triangle fans
    (ref: t/geometry/TriangleMesh::FillHoles, TriangleMesh.cpp:97+).

    TPU design: boundary DIRECTED edges are found by counting undirected
    occurrences with one sort; each boundary vertex's successor builds a
    permutation that is collapsed by pointer doubling (log2 rounds) to a
    per-loop representative (min vertex id); every boundary edge then fans
    to its loop representative in a single vectorized emission. Loops
    longer than `hole_size` are left open, matching the reference's size
    cutoff.
    """
    v = mesh.vertices
    t = jnp.maximum(mesh.triangles, 0)
    V, T = v.shape[0], t.shape[0]
    tmask = mesh.triangle_mask

    # directed edges of live triangles, in winding order
    de = jnp.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], 0)  # (3T,2)
    dlive = jnp.tile(tmask, 3)
    ue = jnp.sort(de, axis=1)
    key0 = jnp.where(dlive, ue[:, 0], jnp.int32(2**30))
    key1 = jnp.where(dlive, ue[:, 1], jnp.int32(2**30))
    s0, s1 = jax.lax.sort((key0, key1), num_keys=2)
    same_prev = jnp.concatenate(
        [jnp.array([False]), (s0[1:] == s0[:-1]) & (s1[1:] == s1[:-1])]
    )
    same_next = jnp.concatenate([same_prev[1:], jnp.array([False])])
    # occurrence count per sorted row: boundary = appears exactly once
    single_sorted = ~same_prev & ~same_next
    # map back: find each live edge's rank in the sorted order
    n3 = de.shape[0]
    _, _, perm = jax.lax.sort(
        (key0, key1, jnp.arange(n3, dtype=jnp.int32)), num_keys=2
    )
    single = jnp.zeros((n3,), bool).at[perm].set(single_sorted)
    bnd = dlive & single  # boundary DIRECTED edges (hole is to their left)

    # successor permutation over boundary vertices: next[a] = b
    nxt = jnp.full((V,), -1, jnp.int32)
    nxt = nxt.at[jnp.where(bnd, de[:, 0], V)].set(
        jnp.where(bnd, de[:, 1], -1), mode="drop"
    )
    is_bnd_v = nxt >= 0

    # pointer doubling: representative = min vertex id on the loop; also
    # count loop length (capped at 2^rounds)
    rounds = max(int(np.ceil(np.log2(max(hole_size, 2)))) + 1, 4)
    rep = jnp.where(is_bnd_v, jnp.arange(V, dtype=jnp.int32), jnp.int32(2**30))
    hop = jnp.where(is_bnd_v, nxt, jnp.arange(V, dtype=jnp.int32))
    length = jnp.where(is_bnd_v, 1, 0)
    for _ in range(rounds):
        rep = jnp.minimum(rep, rep[hop])
        length = length + jnp.where(is_bnd_v, length[hop], 0)
        length = jnp.minimum(length, 2 * hole_size)  # avoid overflow
        hop = hop[hop]
    # length now >= true loop length for loops shorter than 2^rounds; use a
    # second exact pass: loop length = number of boundary verts sharing rep
    cnt = jnp.zeros((V + 1,), jnp.int32).at[
        jnp.where(is_bnd_v, jnp.minimum(rep, V), V)
    ].add(1)
    loop_len = jnp.where(is_bnd_v, cnt[jnp.minimum(rep, V)], 0)

    # fan: boundary edge (a -> b) fans to triangle (b, a, r) — reversed so
    # the new face's winding opposes the boundary edge (outward-consistent)
    r = rep[jnp.where(bnd, de[:, 0], 0)]
    a_, b_ = de[:, 0], de[:, 1]
    emit = (
        bnd
        & (r != a_)
        & (r != b_)
        & (loop_len[jnp.where(bnd, a_, 0)] <= hole_size)
        & (r < jnp.int32(2**30))
    )
    new_t = jnp.stack([b_, a_, r], axis=-1)
    tris = jnp.concatenate([mesh.triangles, jnp.where(emit[:, None], new_t, 0)], 0)
    tm = jnp.concatenate([tmask, emit])
    return TriangleMesh.create(
        v, tris, vertex_mask=mesh.vertex_mask, triangle_mask=tm
    )


# ---------------------------------------------------------------------------
# As-rigid-as-possible deformation
# ---------------------------------------------------------------------------


def deform_as_rigid_as_possible(
    mesh: TriangleMesh,
    constraint_ids,
    constraint_positions,
    max_iter: int = 10,
    n_cg: int = 32,
    max_degree: int = 16,
):
    """ARAP surface deformation (Sorkine-Alexa 2007; ref:
    geometry/TriangleMeshDeformation.cpp DeformAsRigidAsPossible).

    Alternates the classic local/global steps, all shape-static:
    - local: per-vertex rotation R_i from the SVD of the covariance of
      original vs current edge fans (batched 3x3 SVD on device);
    - global: the uniform-weight Laplacian system L p' = b(R) solved
      matrix-free by CG with constraints enforced by a large diagonal
      penalty (the reference uses a sparse Cholesky with hard rows).
    Vertex neighborhoods use a fixed max_degree ring buffer (TPU static
    shapes); the reference's cotangent weights are replaced by uniform
    weights (documented divergence — identical fixed points for regular
    meshes, slightly different interior fairing on irregular ones).

    Returns a new TriangleMesh with deformed vertex positions.
    """
    V = mesh.vertices.shape[0]
    tris = mesh.triangles
    vmask = mesh.vertex_mask

    # fixed-degree adjacency: scatter each directed edge into a ring buffer
    e_src = jnp.concatenate([tris[:, 0], tris[:, 1], tris[:, 2], tris[:, 1], tris[:, 2], tris[:, 0]])
    e_dst = jnp.concatenate([tris[:, 1], tris[:, 2], tris[:, 0], tris[:, 0], tris[:, 1], tris[:, 2]])
    tri_live = jnp.repeat(mesh.triangle_mask, 3)
    live = jnp.concatenate([tri_live, tri_live])
    # slot per (src): running count via sort by src then position-in-segment
    order = jnp.argsort(jnp.where(live, e_src, V).astype(jnp.int32), stable=True)
    s_sorted = e_src[order]
    l_sorted = live[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s_sorted[1:] != s_sorted[:-1]]
    )
    seg_pos = jnp.arange(s_sorted.shape[0]) - jnp.maximum.accumulate(
        jnp.where(first, jnp.arange(s_sorted.shape[0]), 0)
    )
    slot = jnp.where(l_sorted & (seg_pos < max_degree), seg_pos, max_degree)
    nbr = jnp.full((V, max_degree + 1), -1, jnp.int32)
    nbr = nbr.at[jnp.where(l_sorted, s_sorted, V), slot].set(
        e_dst[order].astype(jnp.int32), mode="drop"
    )
    nbr = nbr[:, :max_degree]  # (V, D) neighbor ids, -1 = empty
    nmask = nbr >= 0
    nsafe = jnp.maximum(nbr, 0)
    deg = jnp.sum(nmask, axis=1).astype(jnp.float32)

    p0 = mesh.vertices
    cid = jnp.asarray(constraint_ids, jnp.int32)
    cpos = jnp.asarray(constraint_positions, jnp.float32)
    pen = jnp.zeros((V,), jnp.float32).at[cid].set(1e4)
    pen_b = jnp.zeros((V, 3), jnp.float32).at[cid].set(1e4 * cpos)

    def laplacian_apply(p):
        nb = p[nsafe] * nmask[..., None]
        return deg[:, None] * p - jnp.sum(nb, axis=1)

    def global_step(R):
        # b_i = sum_j 0.5 (R_i + R_j)(p0_i - p0_j) + penalty terms
        d0 = p0[:, None, :] - p0[nsafe]  # (V, D, 3)
        Rsum = 0.5 * (R[:, None, :, :] + R[nsafe])
        b = jnp.sum(
            jnp.einsum("vdij,vdj->vdi", Rsum, d0) * nmask[..., None], axis=1
        )
        b = b + pen_b

        def A(p):
            return laplacian_apply(p) + pen[:, None] * p

        x = p0
        r = b - A(x)
        pdir = r
        rs = jnp.sum(r * r)

        def body(k, st):
            x, r, pdir, rs = st
            Ap = A(pdir)
            alpha = rs / jnp.maximum(jnp.sum(pdir * Ap), 1e-30)
            x = x + alpha * pdir
            r = r - alpha * Ap
            rs2 = jnp.sum(r * r)
            pdir = r + (rs2 / jnp.maximum(rs, 1e-30)) * pdir
            return (x, r, pdir, rs2)

        x, _, _, _ = jax.lax.fori_loop(0, n_cg, body, (x, r, pdir, rs))
        return x

    def local_step(p):
        d0 = (p0[:, None, :] - p0[nsafe]) * nmask[..., None]
        d1 = (p[:, None, :] - p[nsafe]) * nmask[..., None]
        S = jnp.einsum("vdi,vdj->vij", d0, d1)
        U, _, Vt = jnp.linalg.svd(S + 1e-9 * jnp.eye(3))
        det = jnp.linalg.det(jnp.einsum("vij,vjk->vik", U, Vt).transpose(0, 2, 1))
        D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
        R = jnp.einsum("vji,vj,vkj->vik", Vt, D, U)  # V diag(D) U^T transposed
        return R

    def outer(k, p):
        R = local_step(p)
        return global_step(R)

    p = jax.lax.fori_loop(0, max_iter, outer, p0)
    p = p.at[cid].set(cpos)  # exact constraints
    import dataclasses as _dc

    return _dc.replace(mesh, vertices=jnp.where(vmask[:, None], p, mesh.vertices))


# ---------------------------------------------------------------------------
# Boolean operations (SDF-based)
# ---------------------------------------------------------------------------


def _boolean_sdf(mesh_a: TriangleMesh, mesh_b: TriangleMesh, op: str,
                 voxel_size: float, padding: float, triangle_capacity: int):
    """Shared machinery: sample both meshes' signed distances on a dense
    grid over the union AABB, combine per-op, re-extract with marching
    tetrahedra.

    Reference: TriangleMesh::BooleanUnion/Intersection/Difference
    (t/geometry/TriangleMesh.h, VtkUtils.cpp — exact BREP booleans via
    VTK). TPU redesign: exact intersection curve tracking is pointer-
    chasing; an SDF composite (min/max/clamp of two watertight-mesh
    signed-distance fields, Ricci '73) maps to two RaycastingScene
    distance sweeps + one elementwise combine + one marching pass, all
    data-parallel. Accuracy is bounded by voxel_size at the seam; the
    inputs must be (near-)watertight for the parity-based sign.
    """
    import numpy as np

    from open3d_tpu.geometry.raycasting import RaycastingScene
    from open3d_tpu.pipelines.surface_reconstruction import (
        marching_tetrahedra_dense,
    )

    lo = jnp.minimum(mesh_a.get_min_bound(), mesh_b.get_min_bound()) - padding
    hi = jnp.maximum(mesh_a.get_max_bound(), mesh_b.get_max_bound()) + padding
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    dims = np.maximum(np.ceil((hi - lo) / voxel_size).astype(int) + 1, 2)
    xs = [lo[i] + np.arange(dims[i]) * voxel_size for i in range(3)]
    gx, gy, gz = jnp.meshgrid(*[jnp.asarray(x, jnp.float32) for x in xs],
                              indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    def sdf_of(mesh):
        v, t = mesh.compact()
        scene = RaycastingScene()
        scene.add_triangles(v, t)
        return scene.compute_signed_distance(pts)

    da = sdf_of(mesh_a)
    db = sdf_of(mesh_b)
    if op == "union":
        d = jnp.minimum(da, db)
    elif op == "intersection":
        d = jnp.maximum(da, db)
    elif op == "difference":
        d = jnp.maximum(da, -db)
    else:
        raise ValueError(op)
    field = d.reshape(tuple(dims))
    return marching_tetrahedra_dense(
        field, iso=0.0, origin=tuple(lo.tolist()), spacing=voxel_size,
        triangle_capacity=triangle_capacity,
    )


def boolean_union(mesh_a: TriangleMesh, mesh_b: TriangleMesh,
                  voxel_size: float = 0.02, padding: float = 0.05,
                  triangle_capacity: int = 131072) -> TriangleMesh:
    """(ref: TriangleMesh::BooleanUnion, t/geometry/TriangleMesh.h)"""
    return _boolean_sdf(mesh_a, mesh_b, "union", voxel_size, padding,
                        triangle_capacity)


def boolean_intersection(mesh_a: TriangleMesh, mesh_b: TriangleMesh,
                         voxel_size: float = 0.02, padding: float = 0.05,
                         triangle_capacity: int = 131072) -> TriangleMesh:
    """(ref: TriangleMesh::BooleanIntersection)"""
    return _boolean_sdf(mesh_a, mesh_b, "intersection", voxel_size, padding,
                        triangle_capacity)


def boolean_difference(mesh_a: TriangleMesh, mesh_b: TriangleMesh,
                       voxel_size: float = 0.02, padding: float = 0.05,
                       triangle_capacity: int = 131072) -> TriangleMesh:
    """(ref: TriangleMesh::BooleanDifference)"""
    return _boolean_sdf(mesh_a, mesh_b, "difference", voxel_size, padding,
                        triangle_capacity)


# ---------------------------------------------------------------------------
# UV atlas + texture baking
# ---------------------------------------------------------------------------


def _atlas_layout(n_tris: int, size: int):
    """One square patch of P x P texels per triangle.

    Returns (P block edge in texels, bpr blocks per row). The reference
    computes isometric charts through UVAtlas (kernel/UVUnwrapping.cpp) —
    a sequential mesh-cut optimizer; this TPU-native atlas gives every
    triangle its own analytic right-triangle patch instead (more seams,
    zero search, fully data-parallel bake)."""
    bpr = int(np.ceil(np.sqrt(max(n_tris, 1))))
    P = size // bpr
    if P < 4:
        raise ValueError(
            f"texture size {size} too small for {n_tris} triangles "
            f"(needs >= {4 * bpr})"
        )
    return P, bpr


def compute_uv_atlas(mesh: TriangleMesh, size: int = 512) -> TriangleMesh:
    """Assign per-triangle texture UVs as a triangle attr "texture_uvs"
    (T, 3, 2), in [0, 1] (ref: TriangleMesh::ComputeUVAtlas,
    t/geometry/kernel/UVUnwrapping.cpp — see _atlas_layout for the
    TPU-native divergence)."""
    T = mesh.triangles.shape[0]
    P, bpr = _atlas_layout(T, size)
    t = jnp.arange(T, dtype=jnp.int32)
    bx = (t % bpr) * P
    by = (t // bpr) * P
    lo, hi = 1.0, P - 2.0
    corners = jnp.asarray([[lo, lo], [hi, lo], [lo, hi]], jnp.float32)
    orig = jnp.stack([bx, by], -1).astype(jnp.float32)  # (T, 2)
    uvs = (corners[None] + orig[:, None, :]) / float(size)
    import dataclasses as _dc

    return _dc.replace(
        mesh,
        triangle_attrs={**mesh.triangle_attrs, "texture_uvs": uvs},
    )


def _patch_barycentrics(P: int):
    """(P, P) barycentric maps for the canonical patch; axis 0 = x (u),
    axis 1 = y (v). Returns (lam0, lam1, lam2, inside)."""
    xs = jnp.arange(P, dtype=jnp.float32)[:, None]
    ys = jnp.arange(P, dtype=jnp.float32)[None, :]
    denom = max(P - 3.0, 1.0)
    lam1 = (xs - 1.0) / denom + 0.0 * ys
    lam2 = (ys - 1.0) / denom + 0.0 * xs
    lam0 = 1.0 - lam1 - lam2
    inside = (lam0 >= -1e-6) & (lam1 >= -1e-6) & (lam2 >= -1e-6)
    return lam0, lam1, lam2, inside


def bake_vertex_attr_textures(
    mesh: TriangleMesh, attr_names, size: int = 512
) -> dict:
    """Rasterize vertex attributes into texture images over the
    per-triangle atlas (ref: TriangleMesh::BakeVertexAttrTextures,
    t/geometry/TriangleMesh.h). Requires compute_uv_atlas's layout.

    Because every triangle owns an analytic patch, the texel -> (triangle,
    barycentric) map is closed-form: the bake is one vectorized
    barycentric blend over (blocks, P, P) texels — no rasterization
    search. Returns {name: (size, size, C) f32}."""
    T = mesh.triangles.shape[0]
    P, bpr = _atlas_layout(T, size)
    n_blocks = bpr * bpr
    tri = jnp.maximum(mesh.triangles, 0)
    lam0, lam1, lam2, inside = _patch_barycentrics(P)

    pad = n_blocks - T
    tri_p = jnp.concatenate([tri, jnp.zeros((pad, 3), jnp.int32)], 0)
    tmask = jnp.concatenate([mesh.triangle_mask, jnp.zeros((pad,), bool)], 0)

    out = {}
    for name in attr_names:
        va = mesh.vertex_attrs[name]
        if va.ndim == 1:
            va = va[:, None]
        C = va.shape[1]
        v012 = va[tri_p]  # (n_blocks, 3, C)
        tex = (
            lam0[None, ..., None] * v012[:, None, None, 0]
            + lam1[None, ..., None] * v012[:, None, None, 1]
            + lam2[None, ..., None] * v012[:, None, None, 2]
        )  # (n_blocks, P, P, C) with axes (block, x, y, C)
        live = inside[None, ..., None] & tmask[:, None, None, None]
        tex = jnp.where(live, tex, 0.0)
        # blocks row-major; uv x = cols, y = rows -> image[y, x]
        img = tex.reshape(bpr, bpr, P, P, C).transpose(0, 3, 1, 2, 4)
        img = img.reshape(bpr * P, bpr * P, C)
        full = jnp.zeros((size, size, C), jnp.float32)
        out[name] = full.at[: bpr * P, : bpr * P].set(img)
    return out


def bake_triangle_attr_textures(
    mesh: TriangleMesh, attr_names, size: int = 512
) -> dict:
    """Constant per-triangle fill of each atlas patch
    (ref: TriangleMesh::BakeTriangleAttrTextures)."""
    T = mesh.triangles.shape[0]
    P, bpr = _atlas_layout(T, size)
    n_blocks = bpr * bpr
    _, _, _, inside = _patch_barycentrics(P)
    pad = n_blocks - T
    tmask = jnp.concatenate([mesh.triangle_mask, jnp.zeros((pad,), bool)], 0)
    out = {}
    for name in attr_names:
        ta = mesh.triangle_attrs[name]
        if ta.ndim == 1:
            ta = ta[:, None]
        C = ta.shape[1]
        tp = jnp.concatenate([ta, jnp.zeros((pad, C), ta.dtype)], 0)
        tex = jnp.where(
            inside[None, ..., None] & tmask[:, None, None, None],
            tp[:, None, None, :], 0.0,
        )
        img = tex.reshape(bpr, bpr, P, P, C).transpose(0, 3, 1, 2, 4)
        img = img.reshape(bpr * P, bpr * P, C)
        full = jnp.zeros((size, size, C), jnp.float32)
        out[name] = full.at[: bpr * P, : bpr * P].set(img)
    return out


# ---------------------------------------------------------------------------
# Connectivity cleanup family (ref: geometry/TriangleMesh.h:117
# ComputeAdjacencyList, :150 MergeCloseVertices, :442
# ClusterConnectedTriangles; the reconstruction demos use CC clustering to
# strip TSDF-mesh debris)
# ---------------------------------------------------------------------------


def _edge_groups(mesh: TriangleMesh):
    """Canonical edge ids for every triangle edge: (3T,) int32 group id such
    that coincident edges (same unordered vertex pair) share a group, plus
    the owning triangle id per entry. Sort-based replacement for the
    reference's unordered_map<Edge, list<Tri>>."""
    tri = mesh.triangles
    T = tri.shape[0]
    a = jnp.stack([tri[:, 0], tri[:, 1], tri[:, 2]], axis=1)  # (T, 3)
    b = jnp.stack([tri[:, 1], tri[:, 2], tri[:, 0]], axis=1)
    lo = jnp.minimum(a, b).reshape(-1)
    hi = jnp.maximum(a, b).reshape(-1)
    valid = jnp.repeat(mesh.triangle_mask, 3)
    BIG = jnp.int32(2**30)
    lo = jnp.where(valid, lo, BIG)
    hi = jnp.where(valid, hi, BIG)
    owner = jnp.arange(3 * T, dtype=jnp.int32) // 3
    lo_s, hi_s, owner_s = jax.lax.sort((lo, hi, owner), num_keys=2)
    # group id = rank of first occurrence of each distinct (lo, hi) pair
    newgrp = jnp.concatenate(
        [jnp.ones((1,), bool), (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])]
    )
    gid_s = jnp.cumsum(newgrp.astype(jnp.int32)) - 1  # (3T,)
    return gid_s, owner_s


def cluster_connected_triangles(mesh: TriangleMesh, max_iterations: int = 512):
    """Connected components over edge-adjacent triangles (ref:
    TriangleMesh::ClusterConnectedTriangles, geometry/TriangleMesh.h:442 —
    the reference BFS over an edge->triangles map is re-expressed as
    min-label propagation through edge groups, the same fixed-point).

    Returns (cluster_ids (T,) int32 with -1 for masked-out triangles,
    n_clusters (), cluster_n_triangles (T,) count of the OWNING cluster per
    triangle, cluster_area (T,) area of the owning cluster per triangle) —
    per-triangle views of the reference's per-cluster vectors, which keeps
    shapes static; unique per-cluster values can be read via np.unique.
    Cluster ids are compacted to 0..k-1 in order of smallest member
    triangle id (the reference's visit order)."""
    tri = mesh.triangles
    T = tri.shape[0]
    gid_s, owner_s = _edge_groups(mesh)
    n_groups = 3 * T

    labels0 = jnp.where(
        mesh.triangle_mask, jnp.arange(T, dtype=jnp.int32), jnp.int32(2**30)
    )

    def body(state):
        labels, _, it = state
        # edge group label = min over triangles sharing the edge
        lab_s = labels[owner_s]
        grp_min = jax.ops.segment_min(lab_s, gid_s, num_segments=n_groups)
        # triangle label = min over its 3 edge groups
        back = grp_min[gid_s]
        new = jax.ops.segment_min(back, owner_s, num_segments=T)
        new = jnp.minimum(labels, new)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iterations)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
    )
    labels = jnp.where(mesh.triangle_mask, labels, -1)

    # compact ids: cluster root = its smallest triangle id (already the
    # label); rank roots by id
    is_root = mesh.triangle_mask & (labels == jnp.arange(T))
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    cluster_ids = jnp.where(mesh.triangle_mask, rank[jnp.maximum(labels, 0)], -1)

    seg = jnp.where(mesh.triangle_mask, cluster_ids, T - 1)
    ones = mesh.triangle_mask.astype(jnp.int32)
    counts = jax.ops.segment_sum(ones, seg, num_segments=T)
    v0 = mesh.vertices[tri[:, 0]]
    v1 = mesh.vertices[tri[:, 1]]
    v2 = mesh.vertices[tri[:, 2]]
    area = 0.5 * jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)
    area = jnp.where(mesh.triangle_mask, area, 0.0)
    areas = jax.ops.segment_sum(area, seg, num_segments=T)
    n_clusters = jnp.sum(is_root.astype(jnp.int32))
    per_tri_count = jnp.where(mesh.triangle_mask, counts[jnp.maximum(cluster_ids, 0)], 0)
    per_tri_area = jnp.where(mesh.triangle_mask, areas[jnp.maximum(cluster_ids, 0)], 0.0)
    return cluster_ids, n_clusters, per_tri_count, per_tri_area


def remove_small_components(
    mesh: TriangleMesh,
    min_triangles: int = 0,
    min_area: float = 0.0,
) -> TriangleMesh:
    """Drop connected components below a triangle-count or area threshold
    (the reference reconstruction demos' debris filter: cluster, then mask
    out small clusters)."""
    _, _, per_tri_count, per_tri_area = cluster_connected_triangles(mesh)
    keep = mesh.triangle_mask
    if min_triangles > 0:
        keep = keep & (per_tri_count >= min_triangles)
    if min_area > 0.0:
        keep = keep & (per_tri_area >= min_area)
    return dataclasses.replace(mesh, triangle_mask=keep)


def merge_close_vertices(mesh: TriangleMesh, eps: float) -> TriangleMesh:
    """Merge vertices closer than ~eps (ref: TriangleMesh::MergeCloseVertices,
    geometry/TriangleMesh.h:150). Grid-quantized variant: vertices falling in
    the same eps-sized cell merge to their centroid (the reference's exact
    radius search can additionally merge across-cell pairs up to eps apart;
    for the mesh-repair use case the cell merge is the load-bearing part).
    Triangles are remapped; collapsed (degenerate) triangles are masked."""
    V = mesh.vertices.shape[0]
    q = jnp.floor(mesh.vertices / max(eps, 1e-12)).astype(jnp.int32)
    BIG = jnp.int32(2**30)
    qx = jnp.where(mesh.vertex_mask, q[:, 0], BIG)
    qy = jnp.where(mesh.vertex_mask, q[:, 1], BIG)
    qz = jnp.where(mesh.vertex_mask, q[:, 2], BIG)
    vid = jnp.arange(V, dtype=jnp.int32)
    qx_s, qy_s, qz_s, order = jax.lax.sort((qx, qy, qz, vid), num_keys=3)
    first = jnp.concatenate(
        [jnp.ones((1,), bool),
         (qx_s[1:] != qx_s[:-1]) | (qy_s[1:] != qy_s[:-1]) | (qz_s[1:] != qz_s[:-1])]
    )
    gid_s = jnp.cumsum(first.astype(jnp.int32)) - 1
    gid = jnp.zeros((V,), jnp.int32).at[order].set(gid_s)
    # representative vertex = group centroid
    w = mesh.vertex_mask.astype(jnp.float32)
    vsum = jax.ops.segment_sum(mesh.vertices * w[:, None], gid, num_segments=V)
    cnt = jax.ops.segment_sum(w, gid, num_segments=V)
    centroid = vsum / jnp.maximum(cnt, 1.0)[:, None]
    # canonical vertex id per group = smallest member id
    rep = jax.ops.segment_min(
        jnp.where(mesh.vertex_mask, jnp.arange(V, dtype=jnp.int32), V - 1),
        gid,
        num_segments=V,
    )
    new_verts = mesh.vertices.at[rep].set(centroid[gid[rep]])
    remap = rep[gid]  # (V,) vertex -> canonical vertex
    new_tri = remap[mesh.triangles]
    degen = (
        (new_tri[:, 0] == new_tri[:, 1])
        | (new_tri[:, 1] == new_tri[:, 2])
        | (new_tri[:, 2] == new_tri[:, 0])
    )
    vmask = mesh.vertex_mask & (jnp.arange(V) == remap[jnp.arange(V)])
    return dataclasses.replace(
        mesh,
        vertices=new_verts,
        triangles=new_tri,
        vertex_mask=vmask,
        triangle_mask=mesh.triangle_mask & ~degen,
    )


def compute_adjacency_list(mesh: TriangleMesh, max_degree: int = 32):
    """Per-vertex adjacency as a fixed-capacity (V, max_degree) int32 array
    padded with -1 (ref: TriangleMesh::ComputeAdjacencyList,
    geometry/TriangleMesh.h:117 — the pointer-free TPU shape of the
    reference's vector<unordered_set<int>>). Returns (adj, degree)."""
    tri = mesh.triangles
    T = tri.shape[0]
    V = mesh.vertices.shape[0]
    src = jnp.concatenate([tri[:, 0], tri[:, 1], tri[:, 2], tri[:, 1], tri[:, 2], tri[:, 0]])
    dst = jnp.concatenate([tri[:, 1], tri[:, 2], tri[:, 0], tri[:, 0], tri[:, 1], tri[:, 2]])
    valid = jnp.tile(mesh.triangle_mask, 6)
    # sort by (src, dst); dedup identical pairs
    BIG = jnp.int32(2**30)
    src_k = jnp.where(valid, src, BIG)
    dst_k = jnp.where(valid, dst, BIG)
    src_s, dst_s = jax.lax.sort((src_k, dst_k), num_keys=2)
    uniq = jnp.concatenate(
        [jnp.ones((1,), bool),
         (src_s[1:] != src_s[:-1]) | (dst_s[1:] != dst_s[:-1])]
    )
    uniq = uniq & (src_s != BIG)
    # slot within each vertex's row
    slot = jnp.cumsum(uniq.astype(jnp.int32)) - 1
    row_start = jax.ops.segment_min(
        jnp.where(uniq, slot, 2**30), jnp.where(uniq, src_s, V - 1), num_segments=V
    )
    local = slot - row_start[jnp.where(uniq, src_s, 0)]
    ok = uniq & (local < max_degree)
    adj = jnp.full((V, max_degree), -1, jnp.int32)
    adj = adj.at[
        jnp.where(ok, src_s, V - 1), jnp.where(ok, local, max_degree - 1)
    ].set(jnp.where(ok, dst_s, -1), mode="drop")
    degree = jax.ops.segment_sum(
        uniq.astype(jnp.int32), jnp.where(uniq, src_s, V - 1), num_segments=V
    )
    return adj, jnp.minimum(degree, max_degree)
