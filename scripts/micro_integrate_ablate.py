"""Ablate the integrate kernel's stages to find the per-block cost split.

Variants: full | nogather (skip lane-selects) | nomatmul (skip one-hot row
matmul) | norelayout (skip (256,1)->(2,128) relayout matmuls) | noslices
(skip the 16-slice sampling loop entirely -> DMA + fuse only).
"""
import sys
import time
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from open3d_tpu.data import synthetic
from open3d_tpu.core import hashmap as hm
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.ops.pallas import integrate as pint
from open3d_tpu.ops.pallas.integrate import (
    _SLAB_H, _SLAB_W, _relayout_256_to_2x128, _TSDF_SCALE,
)


def make_kernel(variant, with_color=True):
    def kern(slots_ref, bx_ref, by_ref, bz_ref, v0_ref, u0_ref, fit_ref,
             params_ref, planes_hbm, tw_in, col_in, tw_out, col_out,
             slab, sem, new_t, new_w, new_r, new_g, new_b,
             *, H, W, Hp, fx, fy, cx, cy, voxel_size, sdf_trunc,
             depth_max, weight_max):
        i = pl.program_id(0)
        v0 = pl.multiple_of(v0_ref[i], 8)
        u0 = pl.multiple_of(u0_ref[i], 128)
        n_planes = 5 if with_color else 2
        for p in range(n_planes):
            pltpu.make_async_copy(
                planes_hbm.at[pl.ds(pl.multiple_of(p * Hp + v0, 8), _SLAB_H),
                              pl.ds(u0, _SLAB_W)],
                slab.at[:, pl.ds(p * _SLAB_W, _SLAB_W)], sem.at[p]).start()
        par = [params_ref[0, j] for j in range(12)]
        R00, R01, R02, R10, R11, R12, R20, R21, R22 = par[:9]
        tX, tY, tZ = par[9:12]
        ok_block = (fit_ref[i] == 1)
        for p in range(n_planes):
            pltpu.make_async_copy(
                planes_hbm.at[pl.ds(pl.multiple_of(p * Hp + v0, 8), _SLAB_H),
                              pl.ds(u0, _SLAB_W)],
                slab.at[:, pl.ds(p * _SLAB_W, _SLAB_W)], sem.at[p]).wait()
        bxf = bx_ref[i].astype(jnp.float32) * (voxel_size * 16)
        byf = by_ref[i].astype(jnp.float32) * (voxel_size * 16)
        bzf = bz_ref[i].astype(jnp.float32) * (voxel_size * 16)
        slab_all = slab[:]
        hp = jax.lax.Precision.HIGHEST
        if variant != "noslices":
            for c in range(16):
                s = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
                lx = (s & 15).astype(jnp.float32)
                ly = (s >> 4).astype(jnp.float32)
                pwx = bxf + lx * voxel_size
                pwy = byf + ly * voxel_size
                pwz = bzf + float(c) * voxel_size
                pcx = R00 * pwx + R01 * pwy + R02 * pwz + tX
                pcy = R10 * pwx + R11 * pwy + R12 * pwz + tY
                pcz = R20 * pwx + R21 * pwy + R22 * pwz + tZ
                zc = jnp.maximum(pcz, 1e-6)
                uf = pcx / zc * fx + cx
                vf = pcy / zc * fy + cy
                ui = jnp.round(uf).astype(jnp.int32)
                vi = jnp.round(vf).astype(jnp.int32)
                su = ui - u0
                sv = vi - v0
                inb = ((pcz > 1e-4) & (ui >= 0) & (ui < W) & (vi >= 0)
                       & (vi < H) & (su >= 0) & (su < _SLAB_W) & (sv >= 0)
                       & (sv < _SLAB_H))
                svc = jnp.clip(sv, 0, _SLAB_H - 1)
                suc = jnp.clip(su, 0, _SLAB_W - 1)
                if variant == "nomatmul":
                    rows_sel = jnp.zeros((256, 5 * _SLAB_W), jnp.float32)
                else:
                    oh = (jax.lax.broadcasted_iota(jnp.int32, (256, _SLAB_H), 1)
                          == svc).astype(jnp.bfloat16)
                    rows_sel = jax.lax.dot_general(
                        oh, slab_all.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                lane = suc & 127
                grp = suc >> 7
                lane_b = jnp.broadcast_to(lane, (256, 128))

                def sample_plane(p):
                    if variant == "nogather":
                        return rows_sel[:, p * _SLAB_W: p * _SLAB_W + 1]
                    v_g0 = jnp.take_along_axis(
                        rows_sel[:, p * _SLAB_W: p * _SLAB_W + 128], lane_b,
                        axis=1)[:, :1]
                    v_g1 = jnp.take_along_axis(
                        rows_sel[:, p * _SLAB_W + 128: (p + 1) * _SLAB_W],
                        lane_b, axis=1)[:, :1]
                    return jnp.where(grp == 0, v_g0, v_g1)

                d = sample_plane(0) + sample_plane(1)
                d_ok = inb & (d > 0) & (d < depth_max)
                sdf = d - pcz
                keep = d_ok & (sdf >= -sdf_trunc) & ok_block
                tsdf_new = jnp.clip(sdf * (1.0 / sdf_trunc), -1.0, 1.0)
                wn = keep.astype(jnp.float32)
                if variant == "norelayout":
                    new_t[pl.ds(2 * c, 2), :] = jnp.broadcast_to(
                        tsdf_new[:2], (2, 128))
                    new_w[pl.ds(2 * c, 2), :] = jnp.broadcast_to(wn[:2], (2, 128))
                    if with_color:
                        for ref, p in ((new_r, 2), (new_g, 3), (new_b, 4)):
                            ref[pl.ds(2 * c, 2), :] = jnp.broadcast_to(
                                sample_plane(p)[:2], (2, 128))
                else:
                    new_t[pl.ds(2 * c, 2), :] = _relayout_256_to_2x128(
                        jnp.where(keep, tsdf_new, 0.0), hp)
                    new_w[pl.ds(2 * c, 2), :] = _relayout_256_to_2x128(wn, hp)
                    if with_color:
                        new_r[pl.ds(2 * c, 2), :] = _relayout_256_to_2x128(
                            jnp.where(keep, sample_plane(2), 0.0), hp)
                        new_g[pl.ds(2 * c, 2), :] = _relayout_256_to_2x128(
                            jnp.where(keep, sample_plane(3), 0.0), hp)
                        new_b[pl.ds(2 * c, 2), :] = _relayout_256_to_2x128(
                            jnp.where(keep, sample_plane(4), 0.0), hp)
        else:
            new_t[:] = jnp.zeros((32, 128), jnp.float32)
            new_w[:] = jnp.zeros((32, 128), jnp.float32)
            if with_color:
                new_r[:] = jnp.zeros((32, 128), jnp.float32)
                new_g[:] = jnp.zeros((32, 128), jnp.float32)
                new_b[:] = jnp.zeros((32, 128), jnp.float32)
        old = tw_in[0]
        old_t = (old >> 16).astype(jnp.float32) * (1.0 / _TSDF_SCALE)
        old_w = (old & 0xFFFF).astype(jnp.float32)
        w_n = new_w[:]
        w_sum = old_w + w_n
        inv = 1.0 / jnp.maximum(w_sum, 1e-6)
        upd = w_n > 0
        t2 = jnp.where(upd, (old_t * old_w + new_t[:] * w_n) * inv, old_t)
        w2 = jnp.minimum(w_sum, weight_max)
        tq = jnp.round(jnp.clip(t2, -1.0, 1.0) * _TSDF_SCALE).astype(jnp.int32)
        tw_out[0] = (tq << 16) | w2.astype(jnp.int32)
        oldc = col_in[0]
        ro = ((oldc >> 21) & 0x7FF).astype(jnp.float32) * (1.0 / 2047.0)
        go = ((oldc >> 10) & 0x7FF).astype(jnp.float32) * (1.0 / 2047.0)
        bo = (oldc & 0x3FF).astype(jnp.float32) * (1.0 / 1023.0)
        if with_color and variant not in ("noslices",):
            r2 = jnp.where(upd, (ro * old_w + new_r[:] * w_n) * inv, ro)
            g2 = jnp.where(upd, (go * old_w + new_g[:] * w_n) * inv, go)
            b2 = jnp.where(upd, (bo * old_w + new_b[:] * w_n) * inv, bo)
        else:
            r2, g2, b2 = ro, go, bo
        ri = jnp.clip(r2 * 2047.0 + 0.5, 0, 2047).astype(jnp.int32)
        gi = jnp.clip(g2 * 2047.0 + 0.5, 0, 2047).astype(jnp.int32)
        bi = jnp.clip(b2 * 1023.0 + 0.5, 0, 1023).astype(jnp.int32)
        col_out[0] = (ri << 21) | (gi << 10) | bi
    return kern


def run(variant, tw3, col3, slots, coords, v0, u0, fit, params, planes, intr,
        vbg):
    Hp = planes.shape[0] // 5
    kern = functools.partial(
        make_kernel(variant), H=intr.height, W=intr.width, Hp=Hp,
        fx=float(intr.fx), fy=float(intr.fy), cx=float(intr.cx),
        cy=float(intr.cy), voxel_size=float(vbg.voxel_size),
        sdf_trunc=float(vbg.sdf_trunc), depth_max=3.0, weight_max=10000.0)
    M = slots.shape[0]

    def row_index(i, slots_s, *rest):
        return (slots_s[i], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7, grid=(M,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 32, 128), row_index),
            pl.BlockSpec((1, 32, 128), row_index),
        ],
        out_specs=(pl.BlockSpec((1, 32, 128), row_index),
                   pl.BlockSpec((1, 32, 128), row_index)),
        scratch_shapes=[
            pltpu.VMEM((_SLAB_H, 5 * _SLAB_W), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
        ] + [pltpu.VMEM((32, 128), jnp.float32)] * 5,
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(tw3.shape, tw3.dtype),
                   jax.ShapeDtypeStruct(col3.shape, col3.dtype)),
        input_output_aliases={9: 0, 10: 1},
    )(slots, coords[:, 0], coords[:, 1], coords[:, 2], v0, u0, fit, params,
      planes, tw3, col3)


def main():
    import numpy as np
    intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
    depths, colors, extr, _ = synthetic.render_sequence(2, intrinsic=intr, span=0.2)
    vbg = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16,
                         block_count=40960, with_color=True)
    FBC = 1024
    keys, cnt = jax.jit(lambda v, d, e: vbg_mod.compute_unique_block_coordinates(
        v, d, intr, e, depth_max=3.0, frame_block_capacity=FBC))(
            vbg, depths[0], extr[0])
    table, slot, ok = jax.jit(hm.activate)(vbg.table, keys)
    rows = jnp.where(ok, slot, vbg.capacity).astype(jnp.int32)
    coords = hm.unpack_coords(keys)
    v0, u0, fit = jax.jit(lambda c, e: pint.block_slab_fit(
        c, intr, e, vbg.voxel_size))(coords, extr[0])
    planes = jax.jit(lambda d, c: pint.prepare_planes(d, c, True))(
        depths[0], colors[0])
    E = extr[0]
    R = E[:3, :3]
    t = E[:3, 3]
    params = jnp.zeros((1, 128), jnp.float32)
    params = params.at[0, :9].set(R.reshape(-1)).at[0, 9:12].set(t)
    C1 = vbg.capacity + 1
    tw3 = vbg.tw.reshape(C1, 32, 128)
    col3 = vbg.color.reshape(C1, 32, 128)

    # CHAINED timing (output feeds the next call's aliased input, with
    # donation): forces real sequential execution through the tunnel —
    # identical-input async loops get coalesced/cached and read ~0 ms.
    def chain_time(name, f, a, b, n=10):
        a, b = f(a, b)
        jax.block_until_ready((a, b))
        t0 = time.perf_counter()
        for _ in range(n):
            a, b = f(a, b)
        jax.block_until_ready((a, b))
        print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms "
              f"sum={int(jnp.sum(a[:100] & 0xFFFF))}", flush=True)

    flib = jax.jit(
        lambda tw, col: pint.integrate_blocks(
            tw, col, rows, coords, v0, u0, fit, planes, intr, E,
            vbg.voxel_size, vbg.sdf_trunc, 3.0),
        donate_argnums=(0, 1))
    chain_time("library", flib, vbg.tw, vbg.color)

    for variant in ("full", "nogather", "nomatmul", "norelayout", "noslices"):
        f = jax.jit(
            functools.partial(
                lambda tw, col, variant_=variant: run(
                    variant_, tw, col, rows, coords, v0, u0, fit, params,
                    planes, intr, vbg)),
            donate_argnums=(0, 1))
        try:
            chain_time(variant, f, tw3 + 0, col3 + 0)
        except Exception as e:
            print(f"{variant}: FAIL {str(e)[:200]}")


if __name__ == "__main__":
    main()
