"""Distributed second-order solvers: sharded pose-graph PCG + Schur BA.

Reference math: pipelines/registration/GlobalOptimization.cpp:190-230 — per
edge, H += conf * J^T Lambda J (6x6 blocks into a dense 6F x 6F system) and
b += conf * J^T Lambda e, solved with sparse Cholesky / dense LDLT
(utility/Eigen.cpp:19-70). The reference is single-node; the distributed
formulation here is the new capability BASELINE.json's north star names
("distributed bundle adjustment via Schur-complement reduction over
collectives", SURVEY.md section 5.8).

TPU design:
- The Hessian is never materialized as 6F x 6F. Edges (or observations) are
  sharded over a mesh axis; every Hessian-vector product is a per-shard
  scatter-add of 6x6 block contributions followed by ONE `psum` over the
  axis (the all-reduce rides ICI). Conjugate gradients with a block-Jacobi
  preconditioner (the diagonal 6x6 blocks, assembled the same way) solves
  the damped system matrix-free.
- Schur bundle adjustment: landmarks are eliminated in closed form (their
  Hessian is 3x3 block-diagonal), and the REDUCED camera system
  S = Hcc - Hcp Hpp^-1 Hpc is applied matrix-free with the same
  observation-sharded psum pattern — the Schur product needs only two
  sweeps over local observations per CG iteration.

Everything works on a single device (mesh=None) with identical semantics —
the collective degenerates to the local sum.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


# ---------------------------------------------------------------------------
# Sharded pose-graph PCG
# ---------------------------------------------------------------------------


class EdgeSystem(NamedTuple):
    """Per-edge linearized system, shardable along the leading (edge) axis."""

    Js: jnp.ndarray  # (E, 6, 6) d r / d xi_source
    Jt: jnp.ndarray  # (E, 6, 6) d r / d xi_target
    Lam: jnp.ndarray  # (E, 6, 6) weighted information (0 for invalid edges)
    r: jnp.ndarray  # (E, 6) residuals
    s: jnp.ndarray  # (E,) int32 source node
    t: jnp.ndarray  # (E,) int32 target node


def _pad_edges(sys: EdgeSystem, multiple: int) -> EdgeSystem:
    E = sys.r.shape[0]
    pad = (-E) % multiple
    if pad == 0:
        return sys
    z = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )
    return EdgeSystem(z(sys.Js), z(sys.Jt), z(sys.Lam), z(sys.r), z(sys.s), z(sys.t))


def _local_gradient(sys: EdgeSystem, F: int):
    """Per-shard b = sum_e J^T Lam r scattered to (F, 6)."""
    JsL = jnp.einsum("eai,eab->ebi", sys.Js, sys.Lam)
    JtL = jnp.einsum("eai,eab->ebi", sys.Jt, sys.Lam)
    b = jnp.zeros((F, 6), jnp.float32)
    b = b.at[sys.s].add(jnp.einsum("ebi,eb->ei", JsL, sys.r))
    b = b.at[sys.t].add(jnp.einsum("ebi,eb->ei", JtL, sys.r))
    return b


def _local_diag_blocks(sys: EdgeSystem, F: int):
    """Per-shard block-diagonal of H scattered to (F, 6, 6)."""
    JsL = jnp.einsum("eai,eab->ebi", sys.Js, sys.Lam)
    JtL = jnp.einsum("eai,eab->ebi", sys.Jt, sys.Lam)
    D = jnp.zeros((F, 6, 6), jnp.float32)
    D = D.at[sys.s].add(jnp.einsum("ebi,ebj->eij", JsL, sys.Js))
    D = D.at[sys.t].add(jnp.einsum("ebi,ebj->eij", JtL, sys.Jt))
    return D


def _local_hv(sys: EdgeSystem, v: jnp.ndarray):
    """Per-shard H v: for each edge, u = Js v_s + Jt v_t; scatter J^T Lam u."""
    F = v.shape[0]
    vs = v[sys.s]
    vt = v[sys.t]
    u = jnp.einsum("eab,eb->ea", sys.Js, vs) + jnp.einsum("eab,eb->ea", sys.Jt, vt)
    w = jnp.einsum("eab,eb->ea", sys.Lam, u)
    y = jnp.zeros((F, 6), jnp.float32)
    y = y.at[sys.s].add(jnp.einsum("eab,ea->eb", sys.Js, w))
    y = y.at[sys.t].add(jnp.einsum("eab,ea->eb", sys.Jt, w))
    return y


def solve_pose_graph_cg(
    sys: EdgeSystem,
    F: int,
    lam: jnp.ndarray,
    anchor: int,
    mesh: Optional[Mesh] = None,
    axis: str = "edges",
    n_iter: int = 64,
    tol: float = 1e-8,
):
    """Solve (H + lam diag(H) + anchor pin) dx = -b matrix-free.

    With `mesh`, edges are sharded over `axis` and the ENTIRE CG loop runs
    inside ONE shard_map: the edge shards stay device-resident across
    iterations and each H-apply costs exactly one psum over `axis` (the
    all-reduce rides ICI). Round-3 wrapped each H-apply in its own
    shard_map, which forced a replicate<->shard respec per CG iteration and
    an SPMD full rematerialization (MULTICHIP_r03: 0.18x at 8 devices);
    keeping the loop inside the shard_map removes that resharding entirely.
    Returns dx (F, 6).
    """

    def cg_core(sys_l: EdgeSystem, lam_l, psum):
        b = psum(_local_gradient(sys_l, F))
        D = psum(_local_diag_blocks(sys_l, F))
        # damping + anchor pin on the diagonal blocks
        dvec = jnp.diagonal(D, axis1=1, axis2=2)  # (F, 6)
        pin = jnp.zeros((F,), jnp.float32).at[anchor].set(1e12)
        damp = lam_l * dvec + 1e-9 + pin[:, None]
        Dd = D + jax.vmap(jnp.diag)(damp)
        # block-Jacobi preconditioner (replicated; F is tiny next to E)
        M_inv = jnp.linalg.inv(Dd + 1e-6 * jnp.eye(6))

        def hv(v):
            return psum(_local_hv(sys_l, v)) + damp * v

        def dot(a, c):
            return jnp.sum(a * c)

        x0 = jnp.zeros((F, 6), jnp.float32)
        r0 = -b - hv(x0)
        z0 = jnp.einsum("fij,fj->fi", M_inv, r0)
        p0 = z0
        rz0 = dot(r0, z0)
        thresh = tol * jnp.maximum(dot(b, b), 1e-30)

        def cond(state):
            i, x, r, p, rz = state
            return (i < n_iter) & (dot(r, r) > thresh)

        def body(state):
            i, x, r, p, rz = state
            Ap = hv(p)
            alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = jnp.einsum("fij,fj->fi", M_inv, r)
            rz_new = dot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return (i + 1, x, r, p, rz_new)

        _, x, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x0, r0, p0, rz0)
        )
        return x

    lam = jnp.asarray(lam, jnp.float32)
    if mesh is None:
        return cg_core(sys, lam, lambda x: x)
    sys = _pad_edges(sys, mesh.shape[axis])
    espec = EdgeSystem(*(P(axis) for _ in range(6)))
    return shard_map(
        lambda s_, l_: cg_core(s_, l_, lambda x: jax.lax.psum(x, axis)),
        mesh=mesh,
        in_specs=(espec, P()),
        out_specs=P(),
        check_vma=False,
    )(sys, lam)


# ---------------------------------------------------------------------------
# Schur-complement bundle adjustment (observation-sharded)
# ---------------------------------------------------------------------------


class BAProblem(NamedTuple):
    """3D-3D bundle adjustment: fragment poses + world landmarks.

    Residual per observation o: r_o = T_c(o)^-1 X_l(o) - p_o (the world
    landmark mapped into the observing fragment's frame vs the locally
    measured point) — the multiway-registration analog of reprojection BA
    (SLAC's data term has the same shape, slac/SLACOptimizer.h:152).
    """

    cam: jnp.ndarray  # (O,) int32 observing fragment
    lm: jnp.ndarray  # (O,) int32 landmark id
    p: jnp.ndarray  # (O, 3) measured point, fragment-local frame
    w: jnp.ndarray  # (O,) weight (0 = invalid/padding)


def _ba_residual_jac(poses, points, prob: BAProblem):
    """Per-observation residual (O,3) + Jacobians Jc (O,3,6), Jp (O,3,3).

    Pose parametrization: left increment on T_c^-1... we perturb the
    world->fragment map W_c = T_c^-1 as exp(xi) W_c, so
    r = W_c X - p,  dr/dxi = [-[W_c X]_x | I],  dr/dX = R(W_c).
    """
    Wr = jnp.transpose(poses[..., :3, :3], (0, 2, 1))  # R^T per camera
    Wt = -jnp.einsum("fij,fj->fi", Wr, poses[..., :3, 3])
    R = Wr[prob.cam]  # (O, 3, 3)
    t = Wt[prob.cam]
    X = points[prob.lm]
    y = jnp.einsum("oij,oj->oi", R, X) + t  # W_c X
    r = y - prob.p
    # skew(y)
    zero = jnp.zeros_like(y[:, 0])
    sk = jnp.stack(
        [
            jnp.stack([zero, -y[:, 2], y[:, 1]], -1),
            jnp.stack([y[:, 2], zero, -y[:, 0]], -1),
            jnp.stack([-y[:, 1], y[:, 0], zero], -1),
        ],
        -2,
    )
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), sk.shape)
    Jc = jnp.concatenate([-sk, I3], axis=-1)  # (O, 3, 6) wrt xi of W_c
    Jp = R  # (O, 3, 3) wrt landmark
    return r, Jc, Jp


def _ba_locals(poses, points, prob: BAProblem, F: int, L: int):
    """Per-shard BA system pieces: bc (F,6), bp (L,3), Hcc_diag (F,6,6),
    Hpp (L,3,3)."""
    r, Jc, Jp = _ba_residual_jac(poses, points, prob)
    w = prob.w[:, None, None]
    JcT = jnp.transpose(Jc, (0, 2, 1)) * w  # (O, 6, 3)
    JpT = jnp.transpose(Jp, (0, 2, 1)) * w  # (O, 3, 3)
    bc = jnp.zeros((F, 6), jnp.float32).at[prob.cam].add(
        jnp.einsum("oij,oj->oi", JcT, r)
    )
    bp = jnp.zeros((L, 3), jnp.float32).at[prob.lm].add(
        jnp.einsum("oij,oj->oi", JpT, r)
    )
    Hcc = jnp.zeros((F, 6, 6), jnp.float32).at[prob.cam].add(
        jnp.einsum("oia,oaj->oij", JcT, Jc)
    )
    Hpp = jnp.zeros((L, 3, 3), jnp.float32).at[prob.lm].add(
        jnp.einsum("oia,oaj->oij", JpT, Jp)
    )
    cost = jnp.sum(prob.w * jnp.sum(r * r, axis=-1))
    return bc, bp, Hcc, Hpp, cost


def _ba_hcp_apply(poses, points, prob: BAProblem, vp, F: int):
    """Per-shard Hcp vp: (L,3) -> (F,6)."""
    _, Jc, Jp = _ba_residual_jac(poses, points, prob)
    w = prob.w[:, None]
    u = jnp.einsum("oij,oj->oi", Jp, vp[prob.lm]) * w  # (O, 3)
    return jnp.zeros((F, 6), jnp.float32).at[prob.cam].add(
        jnp.einsum("oji,oj->oi", Jc, u)
    )


def _ba_hpc_apply(poses, points, prob: BAProblem, vc, L: int):
    """Per-shard Hpc vc: (F,6) -> (L,3)."""
    _, Jc, Jp = _ba_residual_jac(poses, points, prob)
    w = prob.w[:, None]
    u = jnp.einsum("oij,oj->oi", Jc, vc[prob.cam]) * w  # (O, 3)
    return jnp.zeros((L, 3), jnp.float32).at[prob.lm].add(
        jnp.einsum("oji,oj->oi", Jp, u)
    )


def _ba_hcc_apply(poses, points, prob: BAProblem, vc, F: int):
    _, Jc, _ = _ba_residual_jac(poses, points, prob)
    w = prob.w[:, None]
    u = jnp.einsum("oij,oj->oi", Jc, vc[prob.cam]) * w
    return jnp.zeros((F, 6), jnp.float32).at[prob.cam].add(
        jnp.einsum("oji,oj->oi", Jc, u)
    )


def ba_gauss_newton(
    poses: jnp.ndarray,  # (F, 4, 4) fragment->world
    points: jnp.ndarray,  # (L, 3) world landmarks
    prob: BAProblem,
    mesh: Optional[Mesh] = None,
    axis: str = "obs",
    n_outer: int = 5,
    n_cg: int = 32,
    lam: float = 1e-6,
    anchor: int = 0,
):
    """Schur-complement BA over collectives (north-star config 5).

    Each Gauss-Newton step solves the REDUCED camera system
      S dxc = -(bc - Hcp Hpp^-1 bp),   S = Hcc - Hcp Hpp^-1 Hpc
    by preconditioned CG where every S-apply is two observation sweeps +
    psum; then back-substitutes dxp = -Hpp^-1 (bp + Hpc dxc). With `mesh`,
    observations shard over `axis`; poses/landmark vectors stay replicated
    (they are O(F + L), tiny next to observations). The WHOLE Gauss-Newton
    scan runs inside one shard_map so the observation shards stay resident
    and each sweep is exactly one psum (no per-call resharding — the
    round-3 0.18x regression).

    Returns (poses', points', final_cost).
    """
    F = poses.shape[0]
    L = points.shape[0]

    if mesh is None:
        return _ba_gn_core(
            poses, points, prob, F, L, n_outer, n_cg, lam, anchor, lambda x: x
        )

    n_dev = mesh.shape[axis]
    O = prob.p.shape[0]
    pad = (-O) % n_dev
    if pad:
        z = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )
        prob = BAProblem(z(prob.cam), z(prob.lm), z(prob.p), z(prob.w))
    ospec = BAProblem(P(axis), P(axis), P(axis), P(axis))
    rep = P()
    return shard_map(
        lambda Tp, Xp, pr: _ba_gn_core(
            Tp, Xp, pr, F, L, n_outer, n_cg, lam, anchor,
            lambda x: jax.lax.psum(x, axis),
        ),
        mesh=mesh,
        in_specs=(rep, rep, ospec),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )(poses, points, prob)


def _ba_gn_core(poses, points, prob, F, L, n_outer, n_cg, lam, anchor, psum):
    """Gauss-Newton scan body shared by local and sharded paths. `psum`
    reduces observation-sharded partials (identity on a single device)."""
    from open3d_tpu.core import lie

    locals_f = lambda Tp, Xp, pr: jax.tree_util.tree_map(
        psum, _ba_locals(Tp, Xp, pr, F, L)
    )
    hcp = lambda Tp, Xp, pr, v: psum(_ba_hcp_apply(Tp, Xp, pr, v, F))
    hpc = lambda Tp, Xp, pr, v: psum(_ba_hpc_apply(Tp, Xp, pr, v, L))
    hcc = lambda Tp, Xp, pr, v: psum(_ba_hcc_apply(Tp, Xp, pr, v, F))

    pin = jnp.zeros((F,), jnp.float32).at[anchor].set(1e12)

    def gn_step(carry, _):
        poses, points = carry
        bc, bp, Hcc_d, Hpp, cost = locals_f(poses, points, prob)
        Hpp_inv = jnp.linalg.inv(
            Hpp + (lam + 1e-6) * jnp.eye(3, dtype=jnp.float32)
        )  # (L, 3, 3)

        damp_c = lam * jnp.diagonal(Hcc_d, axis1=1, axis2=2) + 1e-9 + pin[:, None]
        M_inv = jnp.linalg.inv(
            Hcc_d + jax.vmap(jnp.diag)(damp_c) + 1e-6 * jnp.eye(6)
        )

        def s_apply(vc):
            # S vc = Hcc vc + damp - Hcp Hpp^-1 Hpc vc  (two sweeps + psum)
            t1 = hcc(poses, points, prob, vc) + damp_c * vc
            t2 = hpc(poses, points, prob, vc)  # (L, 3)
            t3 = jnp.einsum("lij,lj->li", Hpp_inv, t2)
            t4 = hcp(poses, points, prob, t3)  # (F, 6)
            return t1 - t4

        rhs = -(bc - hcp(poses, points, prob, jnp.einsum("lij,lj->li", Hpp_inv, bp)))

        def dot(a, c):
            return jnp.sum(a * c)

        x = jnp.zeros((F, 6), jnp.float32)
        r = rhs - s_apply(x)
        z = jnp.einsum("fij,fj->fi", M_inv, r)
        p = z
        rz = dot(r, z)

        def cg_body(i, st):
            x, r, p, rz = st
            Ap = s_apply(p)
            alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = jnp.einsum("fij,fj->fi", M_inv, r)
            rz2 = dot(r, z)
            p = z + (rz2 / jnp.maximum(rz, 1e-30)) * p
            return (x, r, p, rz2)

        x, _, _, _ = jax.lax.fori_loop(0, n_cg, cg_body, (x, r, p, rz))
        dxp = -jnp.einsum(
            "lij,lj->li", Hpp_inv, bp + hpc(poses, points, prob, x)
        )
        # apply: W_c <- exp(xi) W_c  =>  T_c <- T_c exp(-xi)
        new_poses = jax.vmap(lambda T, d: T @ lie.invert_se3(lie.se3_exp(d)))(
            poses, x
        )
        new_points = points + dxp
        return (new_poses, new_points), cost

    (poses, points), costs = jax.lax.scan(
        gn_step, (poses, points), None, length=n_outer
    )
    return poses, points, costs[-1]
