"""Morton-ordered implicit BVH for ray casting / closest-point queries.

Reference: t/geometry/RaycastingScene.cpp delegates to Embree's BVH; the
TPU build needs its own acceleration structure. Design (TPU-first):

- BUILD is dense vector work: Morton-30 codes of triangle centroids
  (reusing the voxelgrid Morton machinery's bit tricks), one lax.sort, then
  a COMPLETE binary tree over the sorted order whose per-level AABBs come
  from log2(N) pairwise min/max reductions — no Karras range finding, no
  atomics; padded leaves carry empty (inf, -inf) boxes. Tree quality is
  slightly below an SAH/Karras build but the Morton order keeps leaves
  spatially tight, and the build is a handful of fused XLA ops.
- TRAVERSAL is a vmapped lax.while_loop with an explicit fixed-depth stack
  in registers (heap indexing: children of i are 2i+1/2i+2), ordered
  near-child-first with current-best pruning, identical structure for rays
  (slab test + Moller-Trumbore at leaves) and closest-point queries
  (box-distance pruning + point-triangle at leaves).

Complexity: visits O(log N + hits) boxes per ray instead of the tiled
brute force's O(N); the 100k-triangle benchmark in bench lives here.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(3.0e38)


def _expand_bits(v):
    m = lambda x: jnp.uint32(x)
    v = (v * m(0x00010001)) & m(0xFF0000FF)
    v = (v * m(0x00000101)) & m(0x0F00F00F)
    v = (v * m(0x00000011)) & m(0xC30C30C3)
    v = (v * m(0x00000005)) & m(0x49249249)
    return v


def morton3(p01: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) floats in [0, 1] -> 30-bit Morton codes (int32)."""
    q = jnp.clip(p01 * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    code = (
        (_expand_bits(q[:, 0]) << 2)
        | (_expand_bits(q[:, 1]) << 1)
        | _expand_bits(q[:, 2])
    )
    return code.astype(jnp.int32)  # 30 bits: sign-safe


class BVH(NamedTuple):
    node_min: jnp.ndarray  # (2 * L - 1, 3) f32, heap order, root = 0
    node_max: jnp.ndarray  # (2 * L - 1, 3)
    order: jnp.ndarray  # (L,) int32 sorted triangle ids (pad = -1)
    n_leaves: int  # L (power of two)
    v0: jnp.ndarray  # (L, 3) leaf triangle data, sorted order
    e1: jnp.ndarray
    e2: jnp.ndarray


def build_bvh(vertices: jnp.ndarray, triangles: jnp.ndarray, tri_mask=None) -> BVH:
    verts = jnp.asarray(vertices, jnp.float32)
    tris = jnp.asarray(triangles, jnp.int32)
    T = tris.shape[0]
    if tri_mask is None:
        tri_mask = jnp.ones((T,), bool)
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    cen = (a + b + c) / 3.0
    lo = jnp.min(jnp.where(tri_mask[:, None], cen, _INF), axis=0)
    hi = jnp.max(jnp.where(tri_mask[:, None], cen, -_INF), axis=0)
    span = jnp.maximum(hi - lo, 1e-9)
    codes = morton3((cen - lo) / span)
    codes = jnp.where(tri_mask, codes, jnp.int32(0x7FFFFFFF))  # pad to tail
    order = jnp.argsort(codes).astype(jnp.int32)
    order = jnp.where(tri_mask[order], order, -1)

    L = 1 << max(int(np.ceil(np.log2(max(T, 2)))), 1)
    pad = L - T
    if pad:
        order = jnp.concatenate([order, jnp.full((pad,), -1, jnp.int32)])

    safe = jnp.maximum(order, 0)
    live = (order >= 0)[:, None]
    # Empty (padded) leaves are FAR-AWAY POINT boxes, not (inf, -inf):
    # a min>max box passes the slab test (per-axis (t1,t2) = (-inf, +inf)
    # makes tlo=-inf < thi=+inf), which would drag every ray through the
    # whole padded subtree. A point box at +BIG generically misses.
    leaf_min = jnp.where(
        live,
        jnp.minimum(jnp.minimum(a[safe], b[safe]), c[safe]),
        _INF,
    )
    leaf_max = jnp.where(
        live,
        jnp.maximum(jnp.maximum(a[safe], b[safe]), c[safe]),
        _INF,
    )

    mins = [leaf_min]
    maxs = [leaf_max]
    while mins[-1].shape[0] > 1:
        m = mins[-1].reshape(-1, 2, 3)
        M = maxs[-1].reshape(-1, 2, 3)
        mins.append(jnp.min(m, axis=1))
        maxs.append(jnp.max(M, axis=1))
    node_min = jnp.concatenate(mins[::-1], axis=0)  # heap order: root first
    node_max = jnp.concatenate(maxs[::-1], axis=0)

    v0 = jnp.where(live, a[safe], 0.0)
    e1 = jnp.where(live, b[safe] - a[safe], 0.0)
    e2 = jnp.where(live, c[safe] - a[safe], 0.0)
    return BVH(node_min, node_max, order, L, v0, e1, e2)


def _slab(o, inv_d, bmin, bmax, t_best):
    t1 = (bmin - o) * inv_d
    t2 = (bmax - o) * inv_d
    tlo = jnp.max(jnp.minimum(t1, t2))
    thi = jnp.min(jnp.maximum(t1, t2))
    hit = (thi >= jnp.maximum(tlo, 0.0)) & (tlo < t_best)
    return hit, tlo


def _tri_hit(o, d, v0, e1, e2):
    """Moller-Trumbore; returns (t, u, v) with t=inf on miss."""
    p = jnp.cross(d, e2)
    det = jnp.dot(e1, p)
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    s = o - v0
    u = jnp.dot(s, p) * inv
    q = jnp.cross(s, e1)
    v = jnp.dot(d, q) * inv
    t = jnp.dot(e2, q) * inv
    ok = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
    return jnp.where(ok, t, _INF), u, v


@partial(jax.jit, static_argnames=("max_steps",))
def cast_rays(bvh: BVH, origins, directions, max_steps: int = 2048):
    """(R, 3) origins/dirs -> (t_hit (R,), prim_id (R,), uv (R, 2)).
    t_hit = inf on miss. Near-child-first stack traversal, 32-deep."""
    L = bvh.v0.shape[0]  # static (shape), trace-safe
    depth = int(np.log2(L)) + 2

    def one(o, d):
        inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)

        def body(state):
            stack, sp, t_best, best_i, best_uv, it = state
            node = stack[sp - 1]
            sp = sp - 1
            is_leaf = node >= L - 1
            li = jnp.clip(node - (L - 1), 0, L - 1)
            # pop-time prune: t_best may have shrunk since this node was
            # pushed — skip subtrees that can no longer contain a nearer hit
            keep, _ = _slab(o, inv_d, bvh.node_min[node], bvh.node_max[node], t_best)

            # leaf: intersect its triangle
            t, u, v = _tri_hit(o, d, bvh.v0[li], bvh.e1[li], bvh.e2[li])
            take = keep & is_leaf & (t < t_best) & (bvh.order[li] >= 0)
            t_best = jnp.where(take, t, t_best)
            best_i = jnp.where(take, bvh.order[li], best_i)
            best_uv = jnp.where(take, jnp.stack([u, v]), best_uv)

            # internal: test children, push far then near
            c0 = 2 * node + 1
            c1 = 2 * node + 2
            h0, t0 = _slab(o, inv_d, bvh.node_min[c0], bvh.node_max[c0], t_best)
            h1, t1 = _slab(o, inv_d, bvh.node_min[c1], bvh.node_max[c1], t_best)
            h0 = h0 & ~is_leaf & keep
            h1 = h1 & ~is_leaf & keep
            near_is_0 = t0 <= t1
            near = jnp.where(near_is_0, c0, c1)
            far = jnp.where(near_is_0, c1, c0)
            h_near = jnp.where(near_is_0, h0, h1)
            h_far = jnp.where(near_is_0, h1, h0)
            stack = stack.at[sp].set(far)
            sp = sp + h_far.astype(jnp.int32)
            stack = stack.at[sp].set(near)
            sp = sp + h_near.astype(jnp.int32)
            return stack, sp, t_best, best_i, best_uv, it + 1

        def cond(state):
            _, sp, _, _, _, it = state
            return (sp > 0) & (it < max_steps)

        stack0 = jnp.zeros((2 * depth + 4,), jnp.int32)
        init = (stack0, jnp.int32(1), _INF, jnp.int32(-1), jnp.zeros((2,)), jnp.int32(0))
        _, _, t_best, best_i, best_uv, _ = jax.lax.while_loop(cond, body, init)
        return t_best, best_i, best_uv

    return jax.vmap(one)(origins, directions)


def _closest_on_tri(p, a, b, c):
    """Closest point on triangle abc to p (Ericson 5.1.5)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.dot(ab, ap)
    d2 = jnp.dot(ac, ap)
    bp = p - b
    d3 = jnp.dot(ab, bp)
    d4 = jnp.dot(ac, bp)
    cp = p - c
    d5 = jnp.dot(ab, cp)
    d6 = jnp.dot(ac, cp)
    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4
    denom_uv = jnp.maximum(va + vb + vc, 1e-30)
    v = vb / denom_uv
    w = vc / denom_uv
    cand_face = a + ab * v + ac * w
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0, 1)
    cand_ab = a + t_ab * ab
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0, 1)
    cand_ac = a + t_ac * ac
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0, 1)
    cand_bc = b + t_bc * (c - b)

    best = cand_face
    best = jnp.where((va <= 0), cand_bc, best)
    best = jnp.where((vb <= 0) & (jnp.dot(ac, cp) <= 0) | (vb <= 0), cand_ac, best)
    best = jnp.where(vc <= 0, cand_ab, best)
    best = jnp.where((d1 <= 0) & (d2 <= 0), a, best)
    best = jnp.where((d3 >= 0) & (d4 <= d3), b, best)
    best = jnp.where((d6 >= 0) & (d5 <= d6), c, best)
    # robust fallback: pick the true minimum among VALID candidates — the
    # face point only counts when the projection lands inside the triangle
    # (outside, the unclamped barycentric point is closer than any point ON
    # the triangle and would corrupt the minimum)
    inside = (va >= 0) & (vb >= 0) & (vc >= 0)
    far = jnp.full((3,), 1e30, cand_face.dtype)
    cands = jnp.stack(
        [jnp.where(inside, cand_face, far), cand_ab, cand_ac, cand_bc, a, b, c]
    )
    d2s = jnp.sum((cands - p) ** 2, axis=-1)
    return cands[jnp.argmin(d2s)]


@partial(jax.jit, static_argnames=("max_steps",))
def closest_points(bvh: BVH, queries, max_steps: int = 4096):
    """(Q, 3) -> (points (Q, 3), prim_id (Q,), dist (Q,))."""
    L = bvh.v0.shape[0]  # static (shape), trace-safe
    depth = int(np.log2(L)) + 2

    def box_d2(p, bmin, bmax):
        c = jnp.clip(p, bmin, bmax)
        return jnp.sum((c - p) ** 2)

    def one(p):
        def body(state):
            stack, sp, best_d2, best_pt, best_i, it = state
            node = stack[sp - 1]
            sp = sp - 1
            keep = box_d2(p, bvh.node_min[node], bvh.node_max[node]) < best_d2
            is_leaf = node >= L - 1
            li = jnp.clip(node - (L - 1), 0, L - 1)

            cp = _closest_on_tri(
                p, bvh.v0[li], bvh.v0[li] + bvh.e1[li], bvh.v0[li] + bvh.e2[li]
            )
            d2 = jnp.sum((cp - p) ** 2)
            take = keep & is_leaf & (d2 < best_d2) & (bvh.order[li] >= 0)
            best_d2 = jnp.where(take, d2, best_d2)
            best_pt = jnp.where(take, cp, best_pt)
            best_i = jnp.where(take, bvh.order[li], best_i)

            c0 = 2 * node + 1
            c1 = 2 * node + 2
            d20 = box_d2(p, bvh.node_min[c0], bvh.node_max[c0])
            d21 = box_d2(p, bvh.node_min[c1], bvh.node_max[c1])
            h0 = keep & ~is_leaf & (d20 < best_d2)
            h1 = keep & ~is_leaf & (d21 < best_d2)
            near_is_0 = d20 <= d21
            near = jnp.where(near_is_0, c0, c1)
            far = jnp.where(near_is_0, c1, c0)
            h_near = jnp.where(near_is_0, h0, h1)
            h_far = jnp.where(near_is_0, h1, h0)
            stack = stack.at[sp].set(far)
            sp = sp + h_far.astype(jnp.int32)
            stack = stack.at[sp].set(near)
            sp = sp + h_near.astype(jnp.int32)
            return stack, sp, best_d2, best_pt, best_i, it + 1

        def cond(state):
            _, sp, _, _, _, it = state
            return (sp > 0) & (it < max_steps)

        stack0 = jnp.zeros((2 * depth + 4,), jnp.int32)
        init = (
            stack0,
            jnp.int32(1),
            _INF,
            jnp.zeros((3,)),
            jnp.int32(-1),
            jnp.int32(0),
        )
        _, _, d2, pt, i, _ = jax.lax.while_loop(cond, body, init)
        return pt, i, jnp.sqrt(d2)

    return jax.vmap(one)(queries)
