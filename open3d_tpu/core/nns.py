"""Nearest-neighbor search, TPU-native.

Reference: cpp/open3d/core/nns/NearestNeighborSearch.h:25 — KnnSearch,
FixedRadiusSearch, HybridSearch (radius-capped k-NN returning fixed-size
(indices, distances, counts); the ICP workhorse, NearestNeighborSearch.h:121).

The reference builds KD-trees (nanoflann) on CPU and spatial-hash grids /
GEMM-KNN on CUDA (nns/FixedRadiusIndex.h:432, nns/KnnIndex.h:62). On TPU the
dominant design is different: a tiled brute-force distance computation rides
the MXU at near-peak FLOPs with zero build cost and fully static shapes —
for the cloud sizes of this workload (1e4..1e6 points after voxel
downsampling) it beats tree traversal by orders of magnitude because there is
no divergent control flow. dist^2 = |q|^2 - 2 q.t^T + |t|^2 where the cross
term is a (Qc x D) @ (D x Tc) matmul per tile pair.

All functions:
- accept fixed-capacity inputs whose invalid rows are parked at FAR_COORD
  (squared distances ~1e17 can never win a min or fall inside a radius);
- return indices int32, squared distances float32, and for hybrid search a
  per-query neighbor count, with idx = -1 where no neighbor qualifies —
  exactly the reference HybridSearch contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.0e38)


def _pad_rows(x: jnp.ndarray, n: int, fill) -> jnp.ndarray:
    if x.shape[0] == n:
        return x
    pad = jnp.full((n - x.shape[0],) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _dist2_tile(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(Qc, D), (Tc, D) -> (Qc, Tc) squared distances via MXU."""
    qn = jnp.sum(q * q, axis=-1, keepdims=True)
    tn = jnp.sum(t * t, axis=-1, keepdims=True).T
    cross = jnp.dot(q, t.T, preferred_element_type=jnp.float32)
    return jnp.maximum(qn + tn - 2.0 * cross, 0.0)


def knn_search(
    query: jnp.ndarray,
    target: jnp.ndarray,
    k: int,
    target_mask: jnp.ndarray | None = None,
    query_chunk: int = 4096,
    target_chunk: int = 8192,
):
    """Exact k-NN. Returns (indices (N, k) int32, dist2 (N, k) f32) sorted
    ascending; slots beyond the number of valid targets get idx=-1, dist2=BIG.

    (ref: NearestNeighborSearch::KnnSearch -> KnnIndex GEMM path,
    core/nns/kernel/KnnSearchImpl.cuh)
    """
    N, D = query.shape
    M = target.shape[0]
    k = int(min(k, M))
    qc = int(min(query_chunk, N))
    tc = int(min(target_chunk, M))
    n_pad = -(-N // qc) * qc
    m_pad = -(-M // tc) * tc

    qp = _pad_rows(query.astype(jnp.float32), n_pad, 0.0)
    tp = _pad_rows(target.astype(jnp.float32), m_pad, 0.0)
    tmask = jnp.ones((M,), dtype=bool) if target_mask is None else target_mask
    tmask = _pad_rows(tmask, m_pad, False)

    qp = qp.reshape(n_pad // qc, qc, D)
    tp_tiles = tp.reshape(m_pad // tc, tc, D)
    tmask_tiles = tmask.reshape(m_pad // tc, tc)

    def per_query_chunk(q_tile):
        def body(carry, inp):
            best_d, best_i = carry
            t_tile, m_tile, tile_idx = inp
            d2 = _dist2_tile(q_tile, t_tile)
            d2 = jnp.where(m_tile[None, :], d2, _BIG)
            idx = tile_idx * tc + jnp.arange(tc, dtype=jnp.int32)[None, :]
            cat_d = jnp.concatenate([best_d, d2], axis=1)
            cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx, d2.shape)], axis=1)
            neg_d, sel = jax.lax.top_k(-cat_d, k)
            return (-neg_d, jnp.take_along_axis(cat_i, sel, axis=1)), None

        init = (
            jnp.full((qc, k), _BIG, dtype=jnp.float32),
            jnp.full((qc, k), -1, dtype=jnp.int32),
        )
        tile_ids = jnp.arange(m_pad // tc, dtype=jnp.int32)
        (best_d, best_i), _ = jax.lax.scan(body, init, (tp_tiles, tmask_tiles, tile_ids))
        best_i = jnp.where(best_d >= _BIG, -1, best_i)
        return best_d, best_i

    best_d, best_i = jax.lax.map(per_query_chunk, qp)
    best_d = best_d.reshape(n_pad, k)[:N]
    best_i = best_i.reshape(n_pad, k)[:N]
    return best_i, best_d


def one_nn_search(
    query: jnp.ndarray,
    target: jnp.ndarray,
    target_mask: jnp.ndarray | None = None,
    query_chunk: int = 8192,
    target_chunk: int = 8192,
):
    """Specialized 1-NN (the ICP inner loop): running argmin, no top-k merge.
    Returns (idx (N,) int32, dist2 (N,) f32)."""
    N, D = query.shape
    M = target.shape[0]
    qc = int(min(query_chunk, N))
    tc = int(min(target_chunk, M))
    n_pad = -(-N // qc) * qc
    m_pad = -(-M // tc) * tc

    qp = _pad_rows(query.astype(jnp.float32), n_pad, 0.0).reshape(n_pad // qc, qc, D)
    tp = _pad_rows(target.astype(jnp.float32), m_pad, 0.0).reshape(m_pad // tc, tc, D)
    tmask = jnp.ones((M,), dtype=bool) if target_mask is None else target_mask
    tmask = _pad_rows(tmask, m_pad, False).reshape(m_pad // tc, tc)

    def per_query_chunk(q_tile):
        def body(carry, inp):
            best_d, best_i = carry
            t_tile, m_tile, tile_idx = inp
            d2 = jnp.where(m_tile[None, :], _dist2_tile(q_tile, t_tile), _BIG)
            dmin = jnp.min(d2, axis=1)
            imin = jnp.argmin(d2, axis=1).astype(jnp.int32) + tile_idx * tc
            take = dmin < best_d
            return (jnp.where(take, dmin, best_d), jnp.where(take, imin, best_i)), None

        init = (jnp.full((qc,), _BIG, jnp.float32), jnp.full((qc,), -1, jnp.int32))
        tile_ids = jnp.arange(m_pad // tc, dtype=jnp.int32)
        (bd, bi), _ = jax.lax.scan(body, init, (tp, tmask, tile_ids))
        return bd, bi

    bd, bi = jax.lax.map(per_query_chunk, qp)
    return bi.reshape(n_pad)[:N], bd.reshape(n_pad)[:N]


def hybrid_search(
    query: jnp.ndarray,
    target: jnp.ndarray,
    radius: float,
    max_knn: int,
    target_mask: jnp.ndarray | None = None,
    grid_threshold: int | None = 65536,
    max_per_cell: int = 64,
    **chunks,
):
    """Radius-capped k-NN (ref: NearestNeighborSearch::HybridSearch,
    NearestNeighborSearch.h:121). Returns (idx (N, k), dist2 (N, k),
    counts (N,)) with idx=-1 / dist2=0 beyond the per-query count.

    Targets >= `grid_threshold` points route through the hash-grid 27-cell
    probe (core/nns_grid.py — the FixedRadiusIndex analog) instead of the
    O(N*M) MXU sweep. The grid path caps candidates per cell at
    `max_per_cell`; cells denser than that (cell edge == radius) can drop
    true neighbors, so callers needing exact results on large targets should
    pass grid_threshold=None to force the exact brute path, or raise
    max_per_cell (advisor r2 #3: both knobs are plumbed through).
    """
    if grid_threshold is not None and target.shape[0] >= grid_threshold:
        from open3d_tpu.core import nns_grid

        return nns_grid.hybrid_search_grid(
            query, target, radius, max_knn, target_mask, max_per_cell=max_per_cell
        )
    if max_knn == 1:
        idx, d2 = one_nn_search(query, target, target_mask, **chunks)
        ok = d2 <= radius * radius
        idx = jnp.where(ok, idx, -1)[:, None]
        d2 = jnp.where(ok, d2, 0.0)[:, None]
        return idx, d2, ok.astype(jnp.int32)
    idx, d2 = knn_search(query, target, max_knn, target_mask, **chunks)
    ok = (d2 <= radius * radius) & (idx >= 0)
    counts = jnp.sum(ok.astype(jnp.int32), axis=1)
    return jnp.where(ok, idx, -1), jnp.where(ok, d2, 0.0), counts


def fixed_radius_search(
    query: jnp.ndarray,
    target: jnp.ndarray,
    radius: float,
    max_nn: int,
    target_mask: jnp.ndarray | None = None,
    **chunks,
):
    """All neighbors within radius, capped at max_nn (the static-shape stand-in
    for the reference's CSR FixedRadiusSearch, nns/FixedRadiusIndex.h:432)."""
    return hybrid_search(query, target, radius, max_nn, target_mask, **chunks)


class NearestNeighborSearch:
    """Facade mirroring the reference class (target cloud fixed at build).

    There is no index build step on TPU; construction just captures arrays.
    """

    def __init__(self, target: jnp.ndarray, target_mask: jnp.ndarray | None = None):
        self.target = target
        self.target_mask = target_mask

    def knn_search(self, query, k):
        return knn_search(query, self.target, k, self.target_mask)

    def hybrid_search(self, query, radius, max_knn):
        return hybrid_search(query, self.target, radius, max_knn, self.target_mask)

    def fixed_radius_search(self, query, radius, max_nn=64):
        return fixed_radius_search(query, self.target, radius, max_nn, self.target_mask)
