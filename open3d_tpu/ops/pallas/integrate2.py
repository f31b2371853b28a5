"""Pallas TPU fused TSDF integrate, round-5 redesign (manual-DMA grid,
packed-f32 planes, MXU index flatten).

Reference semantics: the per-voxel CUDA integrate kernel,
t/geometry/kernel/VoxelBlockGridImpl.h:153-304 — project voxel -> pixel,
SDF = depth - z clamped to +-trunc, running weighted mean of tsdf + color.

Why this shape (measured on v5e, scripts/perf_micro.py + PERF.md):

1. GRID. Round-4 ran one grid step per capacity slot with BlockSpec-
   pipelined payload rows aliased in/out; a *fully skipped* step measured
   8.6 us, so 2048 steps cost 17.6 ms/frame against ~600 real blocks.
   Here the grid is M/8 steps of 8 blocks; payload rows move by manual
   per-row DMA against the aliased HBM buffer. Skipped blocks issue no
   DMA and no compute: cost tracks touched blocks, not capacity.

2. PLANES. Round-4 sampled five bf16 planes (depth split hi/lo + r/g/b),
   paying a per-plane select chain. Any per-sample select costs ~0.7 us
   per (plane x 2048-chunk) on the VPU, so the plane count IS the cost.
   Here the frame is packed into TWO f32 planes that are integer-exact
   under the one-hot matmul: d24 (24-bit quantized depth — 0.2 um at
   3 m, sharper than round-4's bf16 hi+lo) and rgb24 (8:8:8). f32 and
   bf16 matmuls measure identically at this K=128 shape (857 ns for
   (2048,128)@(128,256)), so exact f32 select costs nothing extra.

3. INDEX FLATTEN. Projection math runs in the (16,128) payload-row
   layout (l = x + 16*(y&7), r = 2z + (y>>3) is bit-exactly the payload
   order, so ops cost ~8 ns instead of ~160 ns at (2048,1)). Mosaic
   rejects the (16,128)->(2048,1) reshape, so the packed pixel index
   (sv*128 + su, sentinel 16384 for invalid) is flattened sample-major
   with one small f32 MXU spread (S1 @ pidx) + static-mask lane
   reduction — all measured-supported ops, ~1.6 us/chunk.

4. RELAYOUT BACK. The (2048,1) selected values reshape to (16,128) for
   ~0.3 us (that direction IS supported), landing straight in payload
   layout. No exact-bf16 hi/lo relayout machinery, no lane gathers.

Out-of-frustum / out-of-window / behind-camera samples get the sentinel
index: their one-hot row is all-zero, the selected d24 is 0, and d == 0
already means invalid depth — the validity mask needs no relayout at all.

Blocks whose projected footprint exceeds the (128, 128) window in either
plane copy are integrated by the XLA fallback path in
voxel_block_grid.integrate; their count is surfaced as a stat.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open3d_tpu.ops.pallas.integrate import (  # noqa: F401 (re-exported)
    _B,
    _B3,
    _SHIFT,
    _SLAB_H,
    _SLAB_W,
    _TSDF_SCALE,
    block_slab_fit,
)

_G = 8  # blocks per grid step
_CHUNK = 2048  # samples per chunk (2 chunks cover the 16^3 block)
_D21 = float((1 << 21) - 1)
_VWIN = 160  # window height (v0 32-aligned for the int8 sublane tile)
_VALIGN = 32
_NSUB = 7  # int8 subplanes: [d_hi7 | d_mid7 | d_lo7 | c0 | c1 | c2 | c3]
# big-window pass for near blocks (footprint <= 193 x 257 px guaranteed,
# i.e. z >= ~0.45 m at TUM intrinsics); beyond that the XLA fallback runs
_VWIN_BIG = 288
_UWIN_BIG = 256
_G_BIG = 4
_BIG_CAPACITY = 256


def plane_dims(H: int, W: int):
    """Padded plane dims used by prepare_planes_v2 (pass as hp/wp to
    block_slab_fit so window clamps match the actual plane buffer)."""
    Hp = max(-(-H // _VALIGN) * _VALIGN, _VWIN_BIG)
    Wp = max(-(-W // 128) * 128, 2 * _SLAB_W, _UWIN_BIG)
    return Hp, Wp


def prepare_planes_v2(depth: jnp.ndarray, color, with_color: bool, depth_max: float):
    """Pack the frame as SEVEN int8 subplanes — d21 (21-bit quantized
    depth, 1.4 um at 3 m) split into three 7-bit chunks and rgb24 (8:8:8)
    split into four 6-bit chunks — in an original and a 64-lane-shifted
    copy (window alignment, see integrate.py docstring), padded so a
    (VWIN, SLAB_W) window always fits. All chunk values are in [0, 127],
    so the int8 one-hot matmul reconstructs them exactly in int32; padding
    reads as d21 = 0 = invalid."""
    H, W = depth.shape
    Hp, Wp = plane_dims(H, W)
    # floor, not round: depths just below depth_max (e.g. a far clip at
    # depth_max - 1 ulp) must NOT quantize up to full scale, which decodes
    # to exactly depth_max and flips the d < depth_max validity check
    d21 = jnp.where(
        (depth > 0) & jnp.isfinite(depth),
        jnp.floor(jnp.clip(depth, 0.0, depth_max) * (_D21 / depth_max)),
        0.0,
    ).astype(jnp.int32)
    if with_color and color is not None:
        c8 = jnp.round(jnp.clip(color, 0.0, 1.0) * 255.0).astype(jnp.int32)
        rgb24 = (c8[..., 0] << 16) | (c8[..., 1] << 8) | c8[..., 2]
    else:
        rgb24 = jnp.zeros_like(d21)
    subs = [
        d21 >> 14,
        (d21 >> 7) & 127,
        d21 & 127,
        rgb24 >> 18,
        (rgb24 >> 12) & 63,
        (rgb24 >> 6) & 63,
        rgb24 & 63,
    ]
    stack = jnp.stack(subs, axis=0).astype(jnp.int8)  # (7, H, W)
    stack = jnp.pad(stack, ((0, 0), (0, Hp - H), (0, Wp - W)))
    shifted = jnp.pad(stack[:, :, _SHIFT:], ((0, 0), (0, 0), (0, _SHIFT)))
    both = jnp.concatenate([stack, shifted], axis=0)  # (14, Hp, Wp)
    return both.reshape(2 * _NSUB * Hp, Wp)


def _integrate_kernel_v2(
    # scalar prefetch
    slots_ref,  # (M,) i32 payload row (C = invalid/dump)
    bx_ref,  # (M,) i32 block coords
    by_ref,
    bz_ref,
    v0_ref,  # (M,) i32 slab origin (16-aligned)
    u0_ref,  # (M,) i32 slab origin IN ITS COPY's columns (128-aligned)
    shift_ref,  # (M,) i32 0 = original copy, 1 = 64-lane-shifted copy
    fit_ref,  # (M,) i32 1 = slab covers the footprint
    # inputs
    params_ref,  # (1, 128) f32
    planes_hbm,  # (2 * 7 * Hp, Wp) i8 [orig | shifted] row-stacked
    tw_in,  # (C+1, 32, 128) i32 HBM (aliased with tw_out)
    col_in,  # (C+1, 32, 128) i32 HBM (aliased with col_out)
    # outputs (HBM, manual DMA)
    tw_out,
    col_out,
    # scratch
    slab,  # (G, VWIN, 7 * SLAB_W) i8
    pay_tw,  # (G, 32, 128) i32
    pay_col,  # (G, 32, 128) i32
    sem_slab,  # DMA sems (G, 7)
    sem_pay,  # DMA sems (G, 2)
    sem_out,  # DMA sems (G, 2)
    *,
    H: int,
    W: int,
    Hp: int,  # padded plane row stride (each copy is (2*Hp, Wp))
    C: int,  # payload dump row (capacity)
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    voxel_size: float,
    sdf_trunc: float,
    depth_max: float,
    weight_max: float,
    with_color: bool,
    G: int = _G,
    vwin: int = _VWIN,
    uwin: int = _SLAB_W,
):
    i = pl.program_id(0)

    def block_work(j):
        g = i * G + j
        return (slots_ref[g] < C) & (fit_ref[g] == 1)

    def slab_dma(j, g):
        v0 = pl.multiple_of(v0_ref[g], _VALIGN)
        u0 = pl.multiple_of(u0_ref[g], 128)
        copy_off = shift_ref[g] * (_NSUB * Hp)
        return [
            pltpu.make_async_copy(
                planes_hbm.at[
                    pl.ds(pl.multiple_of(copy_off + p * Hp + v0, _VALIGN), vwin),
                    pl.ds(u0, uwin),
                ],
                slab.at[j, :, pl.ds(p * uwin, uwin)],
                sem_slab.at[j, p],
            )
            for p in range(_NSUB)
        ]

    group_any = block_work(0)
    for j in range(1, G):
        group_any = group_any | block_work(j)

    # ---- issue all input DMAs for the group up front ----
    @pl.when(group_any)
    def _group_start():
        for j in range(G):
            @pl.when(block_work(j))
            def _start(j=j):
                g = i * G + j
                for dma in slab_dma(j, g):
                    dma.start()
                row = slots_ref[g]
                pltpu.make_async_copy(tw_in.at[row], pay_tw.at[j], sem_pay.at[j, 0]).start()
                if with_color:
                    pltpu.make_async_copy(
                        col_in.at[row], pay_col.at[j], sem_pay.at[j, 1]
                    ).start()

    par = [params_ref[0, q] for q in range(12)]
    R00, R01, R02, R10, R11, R12, R20, R21, R22 = par[:9]
    tX, tY, tZ = par[9:12]

    # static flatten operands (computed once per grid step)
    s16 = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 16), 1)
    r16 = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 16), 0) >> 7
    S1 = (s16 == r16).astype(jnp.float32)  # (2048, 16) spread matrix
    lL = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 128), 1)
    sL = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 128), 0) & 127
    Lmask = (lL == sL).astype(jnp.float32)  # (2048, 128) static pick mask
    vlane_iota = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, vwin), 1)
    ulane_iota = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, uwin), 1)

    # ---- per-block compute ----
    @pl.when(group_any)
    def _group_do():
        for j in range(G):
            @pl.when(block_work(j))
            def _do(j=j):
                g = i * G + j
                for dma in slab_dma(j, g):
                    dma.wait()
                row_in = slots_ref[g]
                pltpu.make_async_copy(
                    tw_in.at[row_in], pay_tw.at[j], sem_pay.at[j, 0]
                ).wait()
                if with_color:
                    pltpu.make_async_copy(
                        col_in.at[row_in], pay_col.at[j], sem_pay.at[j, 1]
                    ).wait()

                bxf = bx_ref[g].astype(jnp.float32) * (voxel_size * _B)
                byf = by_ref[g].astype(jnp.float32) * (voxel_size * _B)
                bzf = bz_ref[g].astype(jnp.float32) * (voxel_size * _B)
                u0_img = u0_ref[g] + shift_ref[g] * _SHIFT
                v0g = v0_ref[g]
                slab_j = slab[j]  # (VWIN, 7*128) i8

                d24_chunks, rgb_chunks, pcz_chunks = [], [], []
                for k in range(2):
                    # payload-row layout: voxel f = x + 16 y + 256 z sits at
                    # row r = f >> 7, lane l = f & 127; with R = 16k + r2:
                    # lx = l & 15, ly = (l >> 4) + 8*(r2 & 1), lz = 8k + (r2 >> 1)
                    r2 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
                    l2 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
                    lx = (l2 & 15).astype(jnp.float32)
                    ly = ((l2 >> 4) + 8 * (r2 & 1)).astype(jnp.float32)
                    lz = (8 * k + (r2 >> 1)).astype(jnp.float32)
                    pwx = bxf + lx * voxel_size
                    pwy = byf + ly * voxel_size
                    pwz = bzf + lz * voxel_size
                    pcx = R00 * pwx + R01 * pwy + R02 * pwz + tX
                    pcy = R10 * pwx + R11 * pwy + R12 * pwz + tY
                    pcz = R20 * pwx + R21 * pwy + R22 * pwz + tZ
                    zc = jnp.maximum(pcz, 1e-6)
                    ui = jnp.round(pcx / zc * fx + cx).astype(jnp.int32)
                    vi = jnp.round(pcy / zc * fy + cy).astype(jnp.int32)
                    su = ui - u0_img
                    sv = vi - v0g
                    inb = (
                        (pcz > 1e-4)
                        & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
                        & (su >= 0) & (su < uwin) & (sv >= 0) & (sv < vwin)
                    )
                    # sentinel sv = vwin -> all-zero one-hot row -> d21 = 0
                    sv_s = jnp.where(inb, sv, vwin)
                    su_s = jnp.where(inb, su, 0)

                    # flatten (16,128) -> (2048,1) sample-major via ONE small
                    # MXU spread over the concat [sv | su], CENTERED by -128:
                    # the one-pass-bf16 f32 dot is exact only for ints of
                    # <= 8 significant bits, and the big window's sv reaches
                    # 288; the [-128, 160] range is exact
                    svsu = jnp.concatenate([sv_s, su_s], axis=1) - 128
                    Y = jax.lax.dot_general(
                        S1, svsu.astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (2048, 256): Y[s, l'] = svsu[s >> 7, l']
                    svf = jnp.sum(
                        Y[:, :128] * Lmask, axis=1, keepdims=True
                    ).astype(jnp.int32) + 128
                    suf = jnp.sum(
                        Y[:, 128:] * Lmask, axis=1, keepdims=True
                    ).astype(jnp.int32) + 128

                    ohv = (vlane_iota == svf).astype(jnp.int8)  # (2048, vwin)
                    ohu = (ulane_iota == suf).astype(jnp.int32)

                    # int8 one-hot row select, one subplane at a time (the
                    # fused (2048, 7*uwin) i32 temporary would blow VMEM at
                    # the big window size): integer matmul semantics are
                    # exact by construction (Mosaic's default f32 dot
                    # truncates to one bf16 pass; HIGHEST costs 6x, measured)
                    if uwin <= 128:
                        # fused: ONE (2048, 7*uwin) i32 row select + packed
                        # combine + two selects (fastest; measured ~4 us
                        # marginal per block at uwin 128)
                        rows_sel = jax.lax.dot_general(
                            ohv, slab_j, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )  # (2048, 7*uwin) i32: exact integer row select
                        sub = [
                            rows_sel[:, p * uwin : (p + 1) * uwin]
                            for p in range(_NSUB)
                        ]
                        d21row = (sub[0] << 14) | (sub[1] << 7) | sub[2]
                        rgbrow = (
                            (sub[3] << 18) | (sub[4] << 12)
                            | (sub[5] << 6) | sub[6]
                        )
                        d21q = jnp.sum(
                            d21row * ohu, axis=1, keepdims=True
                        ).reshape(16, 128)
                        rgbq = jnp.sum(
                            rgbrow * ohu, axis=1, keepdims=True
                        ).reshape(16, 128)
                    else:
                        # big window: one subplane at a time — the fused
                        # (2048, 7*uwin) i32 temporary would blow VMEM
                        def qsel(p):
                            rows_p = jax.lax.dot_general(
                                ohv, slab_j[:, p * uwin : (p + 1) * uwin],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32,
                            )  # (2048, uwin) i32
                            return jnp.sum(rows_p * ohu, axis=1, keepdims=True)

                        d21q = (
                            (qsel(0) << 14) | (qsel(1) << 7) | qsel(2)
                        ).reshape(16, 128)
                        rgbq = (
                            (qsel(3) << 18) | (qsel(4) << 12)
                            | (qsel(5) << 6) | qsel(6)
                        ).reshape(16, 128)
                    d24_chunks.append(d21q)
                    rgb_chunks.append(rgbq)
                    pcz_chunks.append(pcz)

                d = jnp.concatenate(d24_chunks, axis=0).astype(jnp.float32) * (
                    depth_max / _D21
                )
                rgb = jnp.concatenate(rgb_chunks, axis=0).astype(
                    jnp.float32
                )  # (32,128) 0..2^24-1
                pcz32 = jnp.concatenate(pcz_chunks, axis=0)

                d_ok = (d > 0) & (d < depth_max)  # sentinel/padding -> d == 0
                sdf = d - pcz32
                keep = d_ok & (sdf >= -sdf_trunc)
                tsdf_new = jnp.clip(sdf * (1.0 / sdf_trunc), -1.0, 1.0)
                w_n = keep.astype(jnp.float32)

                # ---- fuse against the old payload row ----
                old = pay_tw[j]
                old_t = (old >> 16).astype(jnp.float32) * (1.0 / _TSDF_SCALE)
                old_w = (old & 0xFFFF).astype(jnp.float32)
                w_sum = old_w + w_n
                inv = 1.0 / jnp.maximum(w_sum, 1e-6)
                upd = w_n > 0
                t_new = jnp.where(keep, tsdf_new, 0.0)
                t2 = jnp.where(upd, (old_t * old_w + t_new * w_n) * inv, old_t)
                w2 = jnp.minimum(w_sum, weight_max)
                tq = jnp.round(jnp.clip(t2, -1.0, 1.0) * _TSDF_SCALE).astype(jnp.int32)
                pay_tw[j] = (tq << 16) | w2.astype(jnp.int32)

                if with_color:
                    oldc = pay_col[j]
                    ro = ((oldc >> 21) & 0x7FF).astype(jnp.float32) * (1.0 / 2047.0)
                    go = ((oldc >> 10) & 0x7FF).astype(jnp.float32) * (1.0 / 2047.0)
                    bo = (oldc & 0x3FF).astype(jnp.float32) * (1.0 / 1023.0)
                    rs = jnp.floor(rgb * (1.0 / 65536.0))
                    gs = jnp.floor((rgb - rs * 65536.0) * (1.0 / 256.0))
                    bs_ = rgb - rs * 65536.0 - gs * 256.0
                    rn = jnp.where(keep, rs * (1.0 / 255.0), 0.0)
                    gn = jnp.where(keep, gs * (1.0 / 255.0), 0.0)
                    bn = jnp.where(keep, bs_ * (1.0 / 255.0), 0.0)
                    r2c = jnp.where(upd, (ro * old_w + rn * w_n) * inv, ro)
                    g2c = jnp.where(upd, (go * old_w + gn * w_n) * inv, go)
                    b2c = jnp.where(upd, (bo * old_w + bn * w_n) * inv, bo)
                    ri = jnp.clip(r2c * 2047.0 + 0.5, 0, 2047).astype(jnp.int32)
                    gi = jnp.clip(g2c * 2047.0 + 0.5, 0, 2047).astype(jnp.int32)
                    bi = jnp.clip(b2c * 1023.0 + 0.5, 0, 1023).astype(jnp.int32)
                    pay_col[j] = (ri << 21) | (gi << 10) | bi

                row = slots_ref[g]
                pltpu.make_async_copy(
                    pay_tw.at[j], tw_out.at[row], sem_out.at[j, 0]
                ).start()
                if with_color:
                    pltpu.make_async_copy(
                        pay_col.at[j], col_out.at[row], sem_out.at[j, 1]
                    ).start()

        # ---- drain output DMAs before the scratch is reused next step ----
    @pl.when(group_any)
    def _group_drain():
        for j in range(G):
            @pl.when(block_work(j))
            def _drain(j=j):
                g = i * G + j
                row = slots_ref[g]
                pltpu.make_async_copy(
                    pay_tw.at[j], tw_out.at[row], sem_out.at[j, 0]
                ).wait()
                if with_color:
                    pltpu.make_async_copy(
                        pay_col.at[j], col_out.at[row], sem_out.at[j, 1]
                    ).wait()


def integrate_blocks_v2(
    tw_buf,  # (C+1, 32, 128) i32 native payload tiling
    color_buf,  # (C+1, 32, 128) i32 (may be (C+1, 0, 0))
    slots,  # (M,) i32 payload rows (C = dump)
    coords,  # (M, 3) i32 block coords
    v0,
    u0,
    shift,
    fit,  # (M,) i32 from block_slab_fit
    planes,  # (2*2*Hp, Wp) f32 from prepare_planes_v2
    intrinsic,
    extrinsic,
    voxel_size: float,
    sdf_trunc: float,
    depth_max: float,
    weight_max: float = 10000.0,
    interpret: Optional[bool] = None,
    vwin: int = _VWIN,
    uwin: int = _SLAB_W,
    group: int = _G,
):
    """Sample + fuse M touched blocks in place. Returns (tw', color').

    vwin/uwin select the window size: the default (160, 128) covers the
    common case; the big-window pass (voxel_block_grid.integrate uses
    (288, 256), group 4) handles near blocks whose footprint exceeds it,
    down to ~0.45 m at TUM intrinsics."""
    if interpret is None:
        from open3d_tpu.core.platform import is_tpu

        interpret = not is_tpu()  # CPU tests run interpreted
    C1 = tw_buf.shape[0]
    assert tw_buf.shape[1:] == (32, 128), tw_buf.shape
    M = slots.shape[0]
    assert M % group == 0, f"work-list capacity {M} % group {group} != 0"
    with_color = color_buf.shape[1] > 0
    H, W = intrinsic.height, intrinsic.width

    R = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    params = jnp.zeros((1, 128), jnp.float32)
    params = params.at[0, :9].set(R.reshape(-1))
    params = params.at[0, 9:12].set(t)

    tw3 = tw_buf
    col3 = color_buf if with_color else jnp.zeros((C1, 32, 128), jnp.int32)

    Hp = planes.shape[0] // (2 * _NSUB)
    kern = functools.partial(
        _integrate_kernel_v2,
        H=H,
        W=W,
        Hp=Hp,
        C=C1 - 1,
        fx=float(intrinsic.fx),
        fy=float(intrinsic.fy),
        cx=float(intrinsic.cx),
        cy=float(intrinsic.cy),
        voxel_size=float(voxel_size),
        sdf_trunc=float(sdf_trunc),
        depth_max=float(depth_max),
        weight_max=float(weight_max),
        with_color=with_color,
        G=group,
        vwin=vwin,
        uwin=uwin,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(M // group,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((group, vwin, _NSUB * uwin), jnp.int8),
            pltpu.VMEM((group, 32, 128), jnp.int32),
            pltpu.VMEM((group, 32, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((group, _NSUB)),
            pltpu.SemaphoreType.DMA((group, 2)),
            pltpu.SemaphoreType.DMA((group, 2)),
        ],
    )
    tw3, col3 = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(tw3.shape, tw3.dtype),
            jax.ShapeDtypeStruct(col3.shape, col3.dtype),
        ),
        input_output_aliases={10: 0, 11: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        slots.astype(jnp.int32),
        coords[:, 0],
        coords[:, 1],
        coords[:, 2],
        v0,
        u0,
        shift,
        fit,
        params,
        planes,
        tw3,
        col3,
    )
    return tw3, (col3 if with_color else color_buf)
