"""Hash-grid fixed-radius / hybrid nearest-neighbor search, TPU-native.

Reference: core/nns/FixedRadiusIndex.h:432 and FixedRadiusSearchImpl.h:60 —
the CUDA pipeline is build (per-point cell hash -> atomic bucket count ->
prefix sum -> permute into bucket-contiguous order) and query (probe the 27
neighbor cells, walk each bucket's point list). That is exactly a sort-based
CSR build, which is the TPU-native formulation:

- BUILD: key every point by its grid cell (cell edge == search radius, so a
  radius ball is covered by the 3x3x3 cell neighborhood), lexicographically
  sort (key, point-index) with one lax.sort, mark segment boundaries, and
  activate the unique cell keys in a core/hashmap table whose per-slot values
  are (segment start, segment count) into the sorted point array. No atomics,
  no prefix-sum kernel: the sort IS the bucket build.
- QUERY: for each query, find() the 27 neighbor cells, gather up to
  `max_per_cell` consecutive sorted points from each hit segment (static
  shape: 27 * max_per_cell candidates), compute squared distances in one
  vectorized pass, and keep the k nearest within the radius via top_k.

Complexity is O(Q * 27 * max_per_cell) instead of brute force's O(Q * N):
at 1e6 points this is ~3 orders of magnitude less distance work. The static
`max_per_cell` cap is the TPU trade: cells denser than the cap contribute
only their first `max_per_cell` sorted points (deterministic). For
voxel-downsampled clouds with cell == radius the occupancy is a few points
per cell; raise `max_per_cell` for exact parity (property-tested against the
brute-force MXU path in tests/test_nns.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open3d_tpu.core import hashmap as hm

_BIG = jnp.float32(3.0e38)


class GridIndex(NamedTuple):
    """CSR-style spatial hash grid over a fixed target cloud."""

    table: jnp.ndarray  # (C, 2) int32 hashmap of occupied cell keys
    seg_start: jnp.ndarray  # (C + 1,) int32 segment start per slot (C = miss)
    seg_count: jnp.ndarray  # (C + 1,) int32 segment length per slot
    order: jnp.ndarray  # (N,) int32: sorted position -> original point index
    points_sorted: jnp.ndarray  # (N, 3) f32 points in bucket-contiguous order
    cell_size: float


def build_grid(
    points: jnp.ndarray,
    cell_size: float,
    mask: jnp.ndarray | None = None,
    table_factor: int = 2,
) -> GridIndex:
    """Build the spatial hash index (ref: FixedRadiusIndex::SetTensorData,
    core/nns/FixedRadiusIndex.h:432 — count/prefix-sum/permute becomes one
    lexicographic sort here). Masked-out rows never match any query."""
    N = points.shape[0]
    pts = points.astype(jnp.float32)
    cell = jnp.floor(pts * (1.0 / cell_size)).astype(jnp.int32)
    keys = hm.pack_coords(cell)
    if mask is not None:
        # invalid rows: clear the valid bit and push to the sort tail
        keys = jnp.where(mask[:, None], keys, jnp.int32(0x7FFFFFFE))
    w0, w1 = keys[..., 0], keys[..., 1]
    s0, s1, order = jax.lax.sort(
        (w0, w1, jnp.arange(N, dtype=jnp.int32)), num_keys=2
    )
    skey = jnp.stack([s0, s1], axis=-1)
    sval = hm.is_valid(skey)
    first = (
        jnp.concatenate(
            [jnp.array([True]), (s0[1:] != s0[:-1]) | (s1[1:] != s1[:-1])]
        )
        & sval
    )
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1  # per sorted row
    n_cells = jnp.sum(first.astype(jnp.int32))

    # compact the unique keys + their segment starts to the front
    pos = jnp.arange(N, dtype=jnp.int32)
    dst = jnp.where(first, seg_id, N)
    uniq = (
        jnp.zeros((N + 1, 2), jnp.int32).at[dst].set(skey, mode="drop")[:N]
    )
    starts = jnp.zeros((N + 1,), jnp.int32).at[dst].set(pos, mode="drop")[:N]
    # segment length = next start - start (last segment ends at #valid rows)
    n_valid = jnp.sum(sval.astype(jnp.int32))
    next_start = jnp.concatenate([starts[1:], starts[-1:]])
    ends = jnp.where(
        jnp.arange(N) == n_cells - 1, n_valid, next_start
    )
    counts = jnp.maximum(ends - starts, 0)
    live = jnp.arange(N) < n_cells
    uniq = jnp.where(live[:, None], uniq, 0)

    C = int(table_factor) * N
    table, slot, ok = hm.activate(hm.make_table(C), uniq, max_rounds=32)
    # Failed activations (ok=False, live=True) must NOT land in row C — row C
    # is the all-zero miss row every not-found cell lookup reads; routing a
    # real (start, count) there would hand bogus candidates to every miss.
    # C + 1 is out of bounds, so mode="drop" discards them (advisor r2 #2).
    rows = jnp.where(ok & live, slot, C + 1)
    seg_start = jnp.zeros((C + 1,), jnp.int32).at[rows].set(
        jnp.where(live, starts, 0), mode="drop"
    )
    seg_count = jnp.zeros((C + 1,), jnp.int32).at[rows].set(
        jnp.where(live, counts, 0), mode="drop"
    )
    return GridIndex(
        table=table,
        seg_start=seg_start,
        seg_count=seg_count,
        order=order,
        points_sorted=pts[order],
        cell_size=float(cell_size),
    )


_OFFSETS_27 = jnp.asarray(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    jnp.int32,
)


def query_grid(
    grid: GridIndex,
    query: jnp.ndarray,
    radius: float,
    max_nn: int,
    max_per_cell: int = 16,
    query_chunk: int = 8192,
):
    """Radius-capped kNN via the 27-cell probe (ref: FixedRadiusSearchImpl.h:60).

    radius must be <= grid.cell_size (one-ring coverage). Returns
    (idx (Q, max_nn) int32 -1-padded, dist2 (Q, max_nn) f32 0-padded,
    counts (Q,) int32) — the reference HybridSearch contract."""
    if radius > grid.cell_size * (1.0 + 1e-6):
        raise ValueError(
            f"radius {radius} exceeds grid cell size {grid.cell_size}; "
            "rebuild the grid with cell_size >= radius"
        )
    Q = query.shape[0]
    P = int(max_per_cell)
    k = int(max_nn)
    r2 = jnp.float32(radius * radius)
    N = grid.points_sorted.shape[0]
    qc = int(min(query_chunk, Q))
    n_pad = -(-Q // qc) * qc
    qpad = jnp.concatenate(
        [query.astype(jnp.float32), jnp.full((n_pad - Q, 3), 1e18, jnp.float32)]
    ) if n_pad != Q else query.astype(jnp.float32)

    pts_ext = jnp.concatenate(
        [grid.points_sorted, jnp.full((P, 3), 1e18, jnp.float32)]
    )  # tail pad so start+P gathers stay in range
    ord_ext = jnp.concatenate([grid.order, jnp.full((P,), -1, jnp.int32)])

    def per_chunk(q):
        cell = jnp.floor(q * (1.0 / grid.cell_size)).astype(jnp.int32)  # (qc,3)
        nb = cell[:, None, :] + _OFFSETS_27[None, :, :]  # (qc,27,3)
        keys = hm.pack_coords(nb.reshape(-1, 3))
        slot, found = hm.find(grid.table, keys)
        rows = jnp.where(found, slot, grid.table.shape[0]).reshape(qc, 27)
        start = grid.seg_start[rows]  # (qc,27)
        cnt = jnp.minimum(grid.seg_count[rows], P)  # (qc,27)
        lanes = jnp.arange(P, dtype=jnp.int32)
        cand = start[..., None] + lanes  # (qc,27,P)
        live = lanes[None, None, :] < cnt[..., None]
        cand = jnp.where(live, cand, N)  # dead lanes hit the 1e18 pad rows
        cpts = pts_ext[cand.reshape(qc, -1)]  # (qc, 27P, 3)
        diff = cpts - q[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(live.reshape(qc, -1), d2, _BIG)
        d2 = jnp.where(d2 <= r2, d2, _BIG)
        neg, sel = jax.lax.top_k(-d2, k)
        bd = -neg
        bi = jnp.take_along_axis(cand.reshape(qc, -1), sel, axis=1)
        ok = bd < _BIG
        idx = jnp.where(ok, ord_ext[jnp.minimum(bi, N + P - 1)], -1)
        return idx, jnp.where(ok, bd, 0.0), jnp.sum(ok.astype(jnp.int32), axis=1)

    idx, d2, cnt = jax.lax.map(per_chunk, qpad.reshape(-1, qc, 3))
    return (
        idx.reshape(n_pad, k)[:Q],
        d2.reshape(n_pad, k)[:Q],
        cnt.reshape(n_pad)[:Q],
    )


def hybrid_search_grid(
    query: jnp.ndarray,
    target: jnp.ndarray,
    radius: float,
    max_knn: int,
    target_mask: jnp.ndarray | None = None,
    max_per_cell: int = 16,
    query_chunk: int = 8192,
):
    """One-shot build + query (ref: NearestNeighborSearch::HybridSearch via
    FixedRadiusIndex when the target is large)."""
    grid = build_grid(target, radius, target_mask)
    return query_grid(grid, query, radius, max_knn, max_per_cell, query_chunk)
