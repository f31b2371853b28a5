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


def _dist2_tile(q: jnp.ndarray, t: jnp.ndarray,
                precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """(Qc, D), (Tc, D) -> (Qc, Tc) squared distances via MXU.

    precision defaults to HIGHEST: the TPU's default one-pass-bf16 f32 dot
    carries ~|q||t|*2^-9 absolute error — ~0.01 at room scale, which round-5
    measurements showed flipping 1-NN winners and inflating a 5 cm
    dmax-gated fitness from 0.40 to 0.61 on a uniform test cloud. At K=3
    the extra passes cost little next to the argmin/top-k reduction."""
    qn = jnp.sum(q * q, axis=-1, keepdims=True)
    tn = jnp.sum(t * t, axis=-1, keepdims=True).T
    cross = jnp.dot(q, t.T, preferred_element_type=jnp.float32,
                    precision=precision)
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


# ---------------------------------------------------------------------------
# Sorted-band 1-NN (the fast ICP correspondence kernel)
# ---------------------------------------------------------------------------
#
# The exact sweep above examines all N*M pairs; at the ICP bench shape
# (40960 x 40960) the VPU argmin over 1.7G distances is ~5 ms/iteration.
# This path exploits spatial locality with zero scatter/gather:
#   build:  project target points onto the dominant-extent axis, sort once;
#           stack the attribute columns the caller needs (positions, normals,
#           original index, ...) into one sorted (Mp, C) matrix.
#   query:  process queries in tiles of Q spatially-sorted rows; every point
#           within `dmax` of a query lies in a CONTIGUOUS run of the sorted
#           target (|key difference| <= dmax), located with two binary
#           searches per tile and fetched with ONE dynamic_slice (a dense
#           DMA, not a gather). The (Q, W) distance tile rides the MXU and
#           the attribute "gather" is a one-hot matmul against the window.
# Pairs examined drop ~10x and the per-correspondence random gathers in the
# estimation stage disappear entirely. Candidate windows are capped at W
# rows (static shape); `shortfall` reports max(required - W) so callers/tests
# can verify the cap never truncated (at the bench density the requirement
# is ~1.3k against W=4096).


def banded_build(
    target: jnp.ndarray,
    target_mask: jnp.ndarray | None,
    attrs: jnp.ndarray | None = None,
    window: int = 4096,
):
    """Sort `target` along its dominant axis; returns the banded index.

    attrs: optional (M, K) extra columns to carry (normals, intensities...).
    The attr matrix is stored TRANSPOSED, (3 + K + 1, Mp): rows
    [positions | attrs | orig_row], columns sorted by key and padded with
    FAR columns — windows slice the LANE dimension, so a (C, W) window is
    C sublanes x W full lanes instead of a W x C sliver padded 16x.
    orig_row is exact in f32 (M < 2^24).
    """
    M = target.shape[0]
    mask = jnp.ones((M,), bool) if target_mask is None else target_mask
    # parked coordinate must stay finite when SQUARED in f32 (1e18 << 3e38);
    # d2 to a parked row is ~1e18, which can never win a dmax-gated argmin
    far = jnp.float32(1e9)
    pos = jnp.where(mask[:, None], target.astype(jnp.float32), far)
    # band axis = principal (largest-variance) direction: for room scans the
    # coordinate axes sit perpendicular to walls, whose points then collapse
    # onto a single key — the PCA major axis spreads them (measured: needed
    # window 1913 vs 2556 on the bench scene, so W=2048 covers exactly)
    nv = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    mu = jnp.sum(jnp.where(mask[:, None], pos, 0.0), axis=0) / nv
    d = jnp.where(mask[:, None], pos - mu, 0.0)
    cov = d.T @ d / nv
    from open3d_tpu.core import linalg as _linalg

    _, evecs = _linalg.eigh3x3(cov)  # ascending eigenvalues
    axis = evecs[:, 2]
    # parked rows sort to the END explicitly (their key sign depends on the
    # eigenvector's arbitrary sign); their POSITION stays at +1e9 so any
    # distance to them is ~1e18
    key = jnp.where(mask, pos @ axis, _BIG)
    perm = jnp.argsort(key)
    cols = [pos, jnp.arange(M, dtype=jnp.float32)[:, None]]
    if attrs is not None:
        cols.insert(1, attrs.astype(jnp.float32))
    A = jnp.concatenate(cols, axis=1)[perm]
    kt = key[perm]
    # pad to a 256 multiple (window chunk granularity) and at least `window`
    Mp = max(-(-M // 256) * 256, int(window))
    if Mp > M:
        A = _pad_rows(A, Mp, 1e9)
        kt = _pad_rows(kt, Mp, _BIG)
    return {"axis": axis, "kt": kt, "AT": A.T, "window": int(window)}


def banded_query_key(banded, query: jnp.ndarray) -> jnp.ndarray:
    return query.astype(jnp.float32) @ banded["axis"]


def banded_one_nn(
    banded,
    query: jnp.ndarray,
    dmax: float,
    tile: int = 512,
    qmask: jnp.ndarray | None = None,
):
    """1-NN of each query against the banded target.

    Queries MUST be in spatially-coherent order (sort by `banded_query_key`
    once per ICP; the band stays valid across small pose updates). Returns
    (idx (N,) int32 original target rows (-1 = none within dmax), d2 (N,)
    f32 exact squared distance to the selected target, sel (N, C) the
    selected target's attribute row, shortfall () i32 = max window deficit —
    0 means no tile's candidate run was truncated).

    Fully batched (no scan): per-dispatch and per-loop-step overheads on the
    TPU runtime dwarf the arithmetic here, so all T tiles are processed as
    one batched matmul + one packed-key reduction. The argmin is a SINGLE
    min over int32 keys (bitcast(d2) with the low 11 mantissa bits replaced
    by the lane id — monotone for d2 >= 0); the winner's attribute row is
    selected by a one-hot matmul (HIGHEST: the default one-pass-bf16 dot
    would truncate the row to bf16) and its d2 recomputed exactly from the
    selected position, so the mantissa clearing never biases the dmax gate.
    """
    N = query.shape[0]
    W = banded["window"]
    kt, AT = banded["kt"], banded["AT"]
    C, Mp = AT.shape
    Q = int(min(tile, N))
    n_pad = -(-N // Q) * Q
    T = n_pad // Q
    qf = _pad_rows(query.astype(jnp.float32), n_pad, 1e9)
    kq = (qf @ banded["axis"]).reshape(T, Q)
    qp = qf.reshape(T, Q, 3)

    # per-tile candidate windows: count-based sorted rank (one broadcast
    # compare-sum; jnp.searchsorted's sequential bisection measured ~60x
    # slower for this many keys)
    if qmask is None:
        qmask = jnp.ones((N,), bool)
    # parked/padded rows are excluded from the span EXPLICITLY: their key is
    # 1e9 * sum(axis components), which for a PCA axis can land anywhere
    ok = _pad_rows(qmask, n_pad, False).reshape(T, Q)
    kmin = jnp.min(jnp.where(ok, kq, _BIG), axis=1)
    kmax = jnp.max(jnp.where(ok, kq, -_BIG), axis=1)
    lo = jnp.sum(kt[None, :] < (kmin - dmax)[:, None], axis=1, dtype=jnp.int32)
    hi = jnp.sum(kt[None, :] <= (kmax + dmax)[:, None], axis=1, dtype=jnp.int32)
    # center the W-wide window on [lo, hi), 256-align for cheap chunk gathers
    start = jnp.clip(((lo + hi - W) // 2) & ~255, 0, Mp - W)
    deficit = jnp.maximum(start - lo, 0) + jnp.maximum(hi - (start + W), 0)

    # window fetch as 256-lane chunks (a coarse gather of (C, 256) blocks)
    nch = W // 256
    AT3 = AT.reshape(C, Mp // 256, 256)
    ch = start[:, None] // 256 + jnp.arange(nch, dtype=jnp.int32)[None, :]
    win = jnp.take(AT3, ch.reshape(-1), axis=1)
    win = win.reshape(C, T, nch, 256).transpose(1, 0, 2, 3).reshape(T, C, W)

    # exact-f32 distances in ONE fused VPU pass: the |q-t|^2 broadcast form
    # has no catastrophic cancellation (the qn+tn-2q.t form needs HIGHEST
    # matmuls whose partial products triple the HBM traffic; one-pass bf16
    # loses ~|q||t|*2^-9 ~ 1e-2 absolute — 4x the dmax^2 gate)
    tpos = win[:, :3].transpose(0, 2, 1)  # (T, W, 3)
    d2 = jnp.sum((qp[:, :, None, :] - tpos[:, None, :, :]) ** 2, axis=-1)

    # single-pass argmin: clear log2(W) mantissa bits, pack the lane id
    # (d2 is recomputed exactly from the winner below, so the cleared bits
    # never bias the dmax gate)
    lane_bits = max(1, (W - 1).bit_length())
    lane_mask = (1 << lane_bits) - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
    key = (jax.lax.bitcast_convert_type(d2, jnp.int32) & ~lane_mask) | lane
    kbest = jnp.min(key, axis=2)  # (T, Q)
    j = kbest & lane_mask

    # one-hot row select in ONE default-precision bf16 matmul: the one-hot
    # is exact in bf16 and the window rows ride as a hi/lo bf16 split
    # ([v_hi | v - v_hi] columns), so sel = hi + lo reconstructs f32 to
    # ~2^-17 relative — the idx column (< 2^16) reconstructs EXACTLY
    onehot = (lane == j[:, :, None]).astype(jnp.bfloat16)
    w_hi = win.astype(jnp.bfloat16)
    w_lo = (win - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    wcat = jnp.concatenate([w_hi, w_lo], axis=1)  # (T, 2C, W)
    sel2 = jax.lax.dot_general(
        onehot, wcat, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (T, Q, 2C)
    sel = sel2[:, :, :C] + sel2[:, :, C:]
    sel = sel.reshape(n_pad, C)[:N]
    dmin = jnp.sum((query.astype(jnp.float32) - sel[:, :3]) ** 2, axis=1)
    idx = jnp.round(sel[:, -1]).astype(jnp.int32)
    valid = dmin <= dmax * dmax
    return jnp.where(valid, idx, -1), dmin, sel, jnp.max(deficit)


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
