"""Pallas TPU kernels for the TSDF voxel block grid hot path.

Replaces the reference's per-voxel CUDA integrate kernel
(t/geometry/kernel/VoxelBlockGridImpl.h:153-304). The TPU shape: the frame's
projective SDF samples are computed by XLA (fused flat gathers); this kernel
does the memory-bound part at DMA speed — for each touched block, stream the
block's packed payload row HBM->VMEM (the row id comes from a scalar-
prefetched slot array, i.e. a *gather-DMA*), fuse the running weighted mean
on the VPU, and write the row back in place (input_output_aliases, so the
grid buffers are updated without copying the other ~40k blocks).

Payload layout (see geometry/voxel_block_grid.py; all-int32 fixed point so
every in-kernel op is a Mosaic-supported i32 shift/mask or i32<->f32 cast):
  tw    i32 = tsdf s1.14 fixed (hi 16, signed) | weight u16 (lo 16)
  color i32 = R:11 | G:11 | B:10
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8  # sublane split of a B^3 row: blocks are (1, 8, B3/8)
_TSDF_SCALE = 16383.0


def _unpack_tw(tw):
    t = (tw >> 16).astype(jnp.float32) * (1.0 / _TSDF_SCALE)
    w = (tw & 0xFFFF).astype(jnp.float32)
    return t, w


def _pack_tw(t, w):
    tq = jnp.round(jnp.clip(t, -1.0, 1.0) * _TSDF_SCALE).astype(jnp.int32)
    return (tq << 16) | w.astype(jnp.int32)


def _unpack_rgb(c):
    r = ((c >> 21) & 0x7FF).astype(jnp.float32) * (1.0 / 2047.0)
    g = ((c >> 10) & 0x7FF).astype(jnp.float32) * (1.0 / 2047.0)
    b = (c & 0x3FF).astype(jnp.float32) * (1.0 / 1023.0)
    return r, g, b


def _pack_rgb(r, g, b):
    ri = jnp.clip(r * 2047.0 + 0.5, 0, 2047).astype(jnp.int32)
    gi = jnp.clip(g * 2047.0 + 0.5, 0, 2047).astype(jnp.int32)
    bi = jnp.clip(b * 1023.0 + 0.5, 0, 1023).astype(jnp.int32)
    return (ri << 21) | (gi << 10) | bi


def _fuse_kernel_color(weight_max, rows, tnew, wn, cnew, tw, col, tw_out, col_out):
    old_tw = tw[...]
    old_t, old_w = _unpack_tw(old_tw)
    w_n = wn[...]
    w_sum = old_w + w_n
    inv = 1.0 / jnp.maximum(w_sum, 1e-6)
    upd = w_n > 0
    t2 = jnp.where(upd, (old_t * old_w + tnew[...] * w_n) * inv, old_t)
    w2 = jnp.minimum(w_sum, weight_max)
    tw_out[...] = _pack_tw(t2, w2)

    ro, go, bo = _unpack_rgb(col[...])
    rn, gn, bn = _unpack_rgb(cnew[...])
    r2 = jnp.where(upd, (ro * old_w + rn * w_n) * inv, ro)
    g2 = jnp.where(upd, (go * old_w + gn * w_n) * inv, go)
    b2 = jnp.where(upd, (bo * old_w + bn * w_n) * inv, bo)
    col_out[...] = _pack_rgb(r2, g2, b2)


def _fuse_kernel_nocolor(weight_max, rows, tnew, wn, tw, tw_out):
    old_t, old_w = _unpack_tw(tw[...])
    w_n = wn[...]
    w_sum = old_w + w_n
    upd = w_n > 0
    t2 = jnp.where(
        upd, (old_t * old_w + tnew[...] * w_n) / jnp.maximum(w_sum, 1e-6), old_t
    )
    w2 = jnp.minimum(w_sum, weight_max)
    tw_out[...] = _pack_tw(t2, w2)


def fuse_blocks(tw_buf, color_buf, rows, tsdf_new, wn, cnew, weight_max=10000.0):
    """Fuse per-voxel samples of M touched blocks into the grid, in place.

    tw_buf (C+1, B3) i32, color_buf (C+1, B3) i32 or None, rows (M,) int32
    (dump row C for invalid blocks), tsdf_new/wn (M, B3) f32, cnew (M, B3)
    i32 or None. Returns (tw_buf', color_buf'|None); the dump row's weight is
    NOT cleared here — callers re-zero row C (one cheap row write)."""
    C1, B3 = tw_buf.shape
    M = rows.shape[0]
    S = _SUB
    L = B3 // S
    from open3d_tpu.core.platform import is_tpu

    interpret = not is_tpu()  # CPU tests run interpreted
    tw3 = tw_buf.reshape(C1, S, L)
    new_spec = pl.BlockSpec((1, S, L), lambda i, rows: (i, 0, 0))
    row_spec = pl.BlockSpec((1, S, L), lambda i, rows: (rows[i], 0, 0))

    if cnew is not None:
        col3 = color_buf.reshape(C1, S, L)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M,),
            in_specs=[new_spec, new_spec, new_spec, row_spec, row_spec],
            out_specs=(row_spec, row_spec),
        )
        tw3, col3 = pl.pallas_call(
            functools.partial(_fuse_kernel_color, float(weight_max)),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(tw3.shape, tw3.dtype),
                jax.ShapeDtypeStruct(col3.shape, col3.dtype),
            ),
            input_output_aliases={4: 0, 5: 1},
            interpret=interpret,
        )(
            rows,
            tsdf_new.reshape(M, S, L),
            wn.reshape(M, S, L),
            cnew.reshape(M, S, L),
            tw3,
            col3,
        )
        return tw3.reshape(C1, B3), col3.reshape(C1, B3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M,),
        in_specs=[new_spec, new_spec, row_spec],
        out_specs=row_spec,
    )
    tw3 = pl.pallas_call(
        functools.partial(_fuse_kernel_nocolor, float(weight_max)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(tw3.shape, tw3.dtype),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(rows, tsdf_new.reshape(M, S, L), wn.reshape(M, S, L), tw3)
    return tw3.reshape(C1, B3), None
