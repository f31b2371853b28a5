"""Sparse TSDF voxel block grid, TPU-native.

Reference: t/geometry/VoxelBlockGrid.{h,cpp} + kernel/VoxelBlockGridImpl.h —
a core::HashMap of 16^3 voxel blocks keyed by Int32x3 block coords with value
buffers {tsdf: f32, weight, color} (ctor VoxelBlockGrid.cpp:65-117);
GetUniqueBlockCoordinates = frustum "touch" on 4x-downsampled depth
(.cpp:212-245, kernel DepthTouch); Integrate = Activate+Find then per-voxel
projective SDF update (VoxelBlockGridImpl.h:153-304); RayCast = 2-pass:
EstimateRange block rasterization (Impl.h:307-560) then per-pixel sphere
trace with in-kernel hash lookups (Impl.h:564-1100); ExtractPointCloud =
zero-crossing detection with neighbor-block tables (.cpp:404-434).

TPU design (round 2, perf-first):
- the hash table is core/hashmap.py's two-word open-addressing table; the
  slot index doubles as the value-buffer row;
- voxel payloads are COMPACT: one (capacity+1, B^3) uint32 "tw" buffer packs
  {tsdf: s1.14 fixed (hi 16) | weight: u16 (lo 16)} and one (capacity+1,
  B^3) int32 "color" buffer packs {R:11|G:11|B:10} — a single gather fetches a
  voxel's full TSDF state (the reference instead supports compact u16/u8
  attr dtypes, VoxelBlockGrid.cpp:65-117). tsdf is NORMALIZED to [-1, 1]
  (sdf / trunc) like the reference; row `capacity` is the scatter dump row
  whose weight is kept 0 (readers treat it as "missing block");
- Integrate computes the projective SDF for all B^3 voxels of the (small,
  static) touched-block capacity with FLAT linearized image gathers, then a
  Pallas scatter-row kernel (scalar-prefetched slot ids select the DMA'd
  row; input_output_aliases updates the grid in place) fuses old/new —
  donate the grid across frames;
- RayCast first rasterizes active blocks into per-16x16-pixel-tile
  (z_min, z_max) ranges (the reference's EstimateRange), then marches all
  rays in lock-step inside one lax.while_loop bounded by the tile range.

Everything is a pytree; `integrate` / `raycast` jit cleanly and the grid
MUST be donated across frames for speed (donate_argnums on the step).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from open3d_tpu.core import hashmap as hm
from open3d_tpu.core.masking import FAR_COORD
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.geometry.pointcloud import PointCloud

# ---------------------------------------------------------------------------
# Packed payload codecs
# ---------------------------------------------------------------------------


# All payload codecs use int32 + fixed point (no unsigned dtypes, no
# bitcasts): Mosaic/TPU supports i32 shifts/masks and i32<->f32 casts
# natively, and s1.14 fixed point resolves the normalized TSDF to 6e-5 —
# finer than the bf16 alternative.
_TSDF_SCALE = 16383.0


def pack_tw(tsdf: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """tsdf f32 in [-1,1] (stored s1.14 fixed) + weight (clipped u16) -> i32."""
    tq = jnp.round(jnp.clip(tsdf, -1.0, 1.0) * _TSDF_SCALE).astype(jnp.int32)
    w = jnp.clip(weight, 0, 65535).astype(jnp.int32)
    return (tq << 16) | w


def unpack_tw(tw: jnp.ndarray):
    """i32 -> (tsdf f32, weight f32). Arithmetic >> recovers the sign."""
    t = (tw >> 16).astype(jnp.float32) * (1.0 / _TSDF_SCALE)
    w = (tw & 0xFFFF).astype(jnp.float32)
    return t, w


def pack_rgb(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) floats in [0, 1] -> i32 {R:11|G:11|B:10} (raw bits)."""
    r = jnp.clip(jnp.round(rgb[..., 0] * 2047.0), 0, 2047).astype(jnp.int32)
    g = jnp.clip(jnp.round(rgb[..., 1] * 2047.0), 0, 2047).astype(jnp.int32)
    b = jnp.clip(jnp.round(rgb[..., 2] * 1023.0), 0, 1023).astype(jnp.int32)
    return (r << 21) | (g << 10) | b


def unpack_rgb(c: jnp.ndarray) -> jnp.ndarray:
    """i32 -> (..., 3) floats in [0, 1] (mask after arithmetic shift)."""
    r = ((c >> 21) & 0x7FF).astype(jnp.float32) / 2047.0
    g = ((c >> 10) & 0x7FF).astype(jnp.float32) / 2047.0
    b = (c & 0x3FF).astype(jnp.float32) / 1023.0
    return jnp.stack([r, g, b], axis=-1)


def payload_shape(B3: int):
    """Native (rows, lanes) payload tiling for one block's B^3 voxels.

    (32, 128) for 16^3. The payload is stored 3-D — (C+1, rows, lanes) —
    because the Pallas integrate/raycast kernels address whole rows of the
    TPU-native (sublane, lane) tiling by DMA; a (C+1, B3) 2-D storage
    would force XLA to physically re-tile the full grid (measured 3.4 ms
    per reshape of a 40960-block grid on v5e) on every kernel call."""
    if B3 % 128 == 0:
        return (B3 // 128, 128)
    return (1, B3)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["table", "tw", "color"],
    meta_fields=["voxel_size", "block_resolution", "sdf_trunc"],
)
@dataclasses.dataclass(frozen=True)
class VoxelBlockGrid:
    table: jnp.ndarray  # (C, 2) int32 packed block keys (see core/hashmap)
    tw: jnp.ndarray  # (C + 1, R, L) i32 {tsdf s1.14 | weight u16}; row C = dump
    color: jnp.ndarray  # (C + 1, R, L) i32 {R11|G11|B10} ((C+1, 0, 0) if none)
    voxel_size: float
    block_resolution: int
    sdf_trunc: float

    @property
    def capacity(self) -> int:
        return self.table.shape[0]

    @property
    def block_size(self) -> float:
        return self.voxel_size * self.block_resolution

    @property
    def has_color(self) -> bool:
        return self.color.shape[1] > 0

    @property
    def tw_flat(self) -> jnp.ndarray:
        """(C+1, B^3) view (re-tiling copy on TPU — keep off hot paths)."""
        return self.tw.reshape(self.tw.shape[0], -1)

    @property
    def color_flat(self) -> jnp.ndarray:
        return self.color.reshape(self.color.shape[0], -1)

    def num_active_blocks(self) -> jnp.ndarray:
        return jnp.sum(hm.occupied_mask(self.table).astype(jnp.int32))

    # convenience views (f32), mainly for tests / IO round-trips
    def tsdf_weight(self):
        return unpack_tw(self.tw_flat)

    def color_f32(self):
        return unpack_rgb(self.color_flat)


def create(
    voxel_size: float = 3.0 / 512,
    block_resolution: int = 16,
    block_count: int = 40960,
    sdf_trunc: Optional[float] = None,
    with_color: bool = True,
) -> VoxelBlockGrid:
    """(ref: VoxelBlockGrid ctor, VoxelBlockGrid.cpp:65-117; default trunc =
    4 voxels, matching trunc_voxel_multiplier=8's half — the reference's
    common configs use 4-8 voxels; we default 4)."""
    B3 = block_resolution**3
    C = block_count
    R, L = payload_shape(B3)
    return VoxelBlockGrid(
        table=hm.make_table(C),
        tw=jnp.zeros((C + 1, R, L), jnp.int32),
        color=jnp.zeros((C + 1, R, L) if with_color else (C + 1, 0, 0), jnp.int32),
        voxel_size=float(voxel_size),
        block_resolution=int(block_resolution),
        sdf_trunc=float(sdf_trunc if sdf_trunc is not None else 4.0 * voxel_size),
    )


# ---------------------------------------------------------------------------
# Touch: which blocks does this depth frame intersect?
# ---------------------------------------------------------------------------


def compute_unique_block_coordinates(
    vbg: VoxelBlockGrid,
    depth: jnp.ndarray,
    intrinsic: PinholeCameraIntrinsic,
    extrinsic: jnp.ndarray,
    depth_max: float = 3.0,
    stride: int = 4,
    frame_block_capacity: int = 2048,
):
    """Packed keys of all blocks within sdf_trunc of the depth surface,
    from a `stride`-downsampled depth image (ref: GetUniqueBlockCoordinates,
    VoxelBlockGrid.cpp:212-245, kernel DepthTouch). Returns
    (keys (frame_block_capacity, 2) int32 invalid-padded, count)."""
    d = depth[::stride, ::stride]
    H, W = d.shape
    u = (jnp.arange(W, dtype=jnp.float32) * stride)[None, :]
    v = (jnp.arange(H, dtype=jnp.float32) * stride)[:, None]
    valid = (d > 0) & (d < depth_max)
    x = jnp.broadcast_to((u - intrinsic.cx) / intrinsic.fx, (H, W))
    y = jnp.broadcast_to((v - intrinsic.cy) / intrinsic.fy, (H, W))
    ray = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)  # dir per unit z
    R = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    cam_origin = -R.T @ t

    bs = vbg.block_size
    # steps along the ray covering [d - trunc, d + trunc] at block pitch
    n_steps = max(int(2.0 * vbg.sdf_trunc / bs + 0.5) + 2, 2)
    zs = jnp.linspace(-vbg.sdf_trunc, vbg.sdf_trunc, n_steps)

    def at_offset(dz):
        z = d + dz
        p_cam = ray * z[..., None]
        p_world = p_cam.reshape(-1, 3) @ R + cam_origin  # R^T row-applied
        block = jnp.floor(p_world / bs).astype(jnp.int32)
        keys = hm.pack_coords(block)
        ok = valid.reshape(-1) & ((d + dz) > 0).reshape(-1)
        return jnp.where(ok[:, None], keys, 0)

    keys_all = jax.vmap(at_offset)(zs).reshape(-1, 2)
    return hm.unique_keys(keys_all, frame_block_capacity)


# ---------------------------------------------------------------------------
# Integrate
# ---------------------------------------------------------------------------


def _voxel_local_coords(B: int) -> jnp.ndarray:
    """(B^3, 3) int32 local voxel coords, x fastest (matches flat index
    x + y*B + z*B^2)."""
    r = jnp.arange(B, dtype=jnp.int32)
    z, y, x = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)


def _new_voxel_values(
    vbg, block_keys, depth, color, intrinsic, extrinsic, depth_max, depth_scale, ok
):
    """Per-voxel projective SDF samples for the touched blocks.

    Returns (tsdf_new (M,B3) f32, wn (M,B3) f32, cnew (M,B3) u32|None).
    Pixel sampling uses FLAT linearized indices (9x faster than 2-D gathers
    on TPU) and one packed-u32 color gather."""
    B = vbg.block_resolution
    coords = hm.unpack_coords(block_keys)  # (M, 3)
    local = _voxel_local_coords(B)  # (B3, 3)
    origin = coords.astype(jnp.float32) * vbg.block_size
    pw = origin[:, None, :] + local.astype(jnp.float32) * vbg.voxel_size

    R = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    from open3d_tpu.core.platform import is_tpu

    if is_tpu():
        # explicit elementwise projection, in the same op order as the
        # Pallas kernel: on TPU a (..., 3) @ (3, 3) dot runs at the default
        # one-pass-bf16 matmul precision, which costs ~5e-3 of voxels their
        # correct keep decision (measured vs f64 ground truth); the
        # matching order also makes half-pixel rounding ties agree with
        # the kernel bit-for-bit (measured 0.0 weight diffs on chip)
        px, py, pz = pw[..., 0], pw[..., 1], pw[..., 2]
        xc = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]
        yc = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]
        z = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]
    else:
        # CPU: the f32 dot is exact and breaks half-pixel ties identically
        # to the interpreted kernel (the explicit form does not)
        pc = pw @ R.T + t
        xc, yc, z = pc[..., 0], pc[..., 1], pc[..., 2]
    u = xc / jnp.maximum(z, 1e-6) * intrinsic.fx + intrinsic.cx
    v = yc / jnp.maximum(z, 1e-6) * intrinsic.fy + intrinsic.cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    Wd = intrinsic.width
    inb = (z > 1e-4) & (ui >= 0) & (ui < Wd) & (vi >= 0) & (vi < intrinsic.height)
    lin = jnp.where(inb, vi * Wd + jnp.clip(ui, 0, Wd - 1), 0)

    d = depth.reshape(-1)[lin] / depth_scale  # (M, B3) flat gather
    d_ok = inb & (d > 0) & (d < depth_max)
    sdf = d - z
    keep = d_ok & (sdf >= -vbg.sdf_trunc)
    tsdf_new = jnp.clip(sdf / vbg.sdf_trunc, -1.0, 1.0)
    wn = (keep & ok[:, None]).astype(jnp.float32)

    cnew = None
    if color is not None and vbg.has_color:
        cpacked = pack_rgb(color).reshape(-1)  # (H*W,) u32, fused by XLA
        cnew = cpacked[lin]  # (M, B3) u32
    return tsdf_new, wn, cnew


def _fuse_xla(vbg, rows, tsdf_new, wn, cnew, weight_max):
    """Portable fuse path: gather rows, weighted-mean, scatter rows back.
    Used on CPU (tests) and as the reference implementation for the Pallas
    kernel in ops/pallas/tsdf.py. The (M, B3) new-value arrays are reshaped
    to the native (M, R, L) payload tiling (cheap: M is the small per-frame
    work list, not the grid capacity)."""
    C = vbg.capacity
    R, L = vbg.tw.shape[1:]
    tsdf_new = tsdf_new.reshape(-1, R, L)
    wn = wn.reshape(-1, R, L)
    if cnew is not None:
        cnew = cnew.reshape(-1, R, L)
    old_t, old_w = unpack_tw(vbg.tw[rows])
    w_sum = old_w + wn
    fused_t = jnp.where(
        wn > 0, (old_t * old_w + tsdf_new * wn) / jnp.maximum(w_sum, 1e-6), old_t
    )
    fused_w = jnp.minimum(w_sum, weight_max)
    tw = vbg.tw.at[rows].set(pack_tw(fused_t, fused_w)).at[C].set(0)
    color_arr = vbg.color
    if cnew is not None:
        old_c = unpack_rgb(vbg.color[rows])
        new_c = unpack_rgb(cnew)
        fused_c = jnp.where(
            (wn > 0)[..., None],
            (old_c * old_w[..., None] + new_c * wn[..., None])
            / jnp.maximum(w_sum, 1e-6)[..., None],
            old_c,
        )
        color_arr = vbg.color.at[rows].set(pack_rgb(fused_c)).at[C].set(0)
    return tw, color_arr


def integrate(
    vbg: VoxelBlockGrid,
    block_keys: jnp.ndarray,  # (M, 2) packed, invalid-padded (from touch)
    depth: jnp.ndarray,
    color: Optional[jnp.ndarray],
    intrinsic: PinholeCameraIntrinsic,
    extrinsic: jnp.ndarray,
    depth_max: float = 3.0,
    depth_scale: float = 1.0,
    weight_max: float = 10000.0,
    use_pallas: Optional[bool] = None,
    fallback_capacity: int = 16,
) -> VoxelBlockGrid:
    """Fuse one depth (+color) frame (ref: VoxelBlockGrid::Integrate,
    .cpp:292-326; per-voxel kernel VoxelBlockGridImpl.h:153-304).

    depth must be metric float32 (pass raw/depth_scale yourself or use
    depth_scale); extrinsic is world->camera. Jit with the grid donated.

    On TPU the sampling + fuse is one Pallas kernel (per-block image-rect
    slab DMA + one-hot MXU sampling + in-place row update — XLA's scalar
    gathers run at ~130M/s and would cost ~60 ms/frame); blocks whose
    footprint exceeds the slab window (closer than ~0.4 m) fall back to the
    XLA gather path, capped at `fallback_capacity` per frame.
    """
    C = vbg.capacity

    table, slot, ok = hm.activate(vbg.table, block_keys)
    rows = jnp.where(ok, slot, C)  # failed/invalid blocks -> dump row

    if use_pallas is None:
        from open3d_tpu.core.platform import is_tpu

        use_pallas = is_tpu()

    if depth_scale != 1.0:
        depth = depth / depth_scale
    vbg = dataclasses.replace(vbg, table=table)

    if use_pallas and vbg.block_resolution == 16:
        import os

        from open3d_tpu.ops.pallas import integrate as pint

        if os.environ.get("O3DTPU_INTEGRATE_V1"):
            # legacy kernel works on the flat 2-D payload view (pays the
            # re-tiling copies; kept only for A/B comparison)
            def integrate_fn(tw3, col3, *args, **kw):
                tw2, col2 = pint.integrate_blocks(
                    tw3.reshape(tw3.shape[0], -1),
                    col3.reshape(col3.shape[0], -1),
                    *args,
                    **kw,
                )
                return tw2.reshape(tw3.shape), col2.reshape(col3.shape)

            planes_fn = lambda: pint.prepare_planes(depth, color, vbg.has_color)
        else:
            from open3d_tpu.ops.pallas import integrate2 as pint2

            integrate_fn = pint2.integrate_blocks_v2
            planes_fn = lambda: pint2.prepare_planes_v2(
                depth, color, vbg.has_color, depth_max
            )

        coords = hm.unpack_coords(block_keys)
        if os.environ.get("O3DTPU_INTEGRATE_V1"):
            fit_kw = {}
        else:
            from open3d_tpu.ops.pallas import integrate2 as _p2

            hp, wp = _p2.plane_dims(intrinsic.height, intrinsic.width)
            fit_kw = {
                "valign": _p2._VALIGN,
                "vwin": _p2._VWIN,
                "hp": hp,
                "wp": wp,
            }
        v0, u0, shift, fit = pint.block_slab_fit(
            coords, intrinsic, extrinsic, vbg.voxel_size, **fit_kw
        )
        planes = planes_fn()
        tw, color_arr = integrate_fn(
            vbg.tw,
            vbg.color,
            rows,
            coords,
            v0,
            u0,
            shift,
            fit,
            planes,
            intrinsic,
            extrinsic,
            vbg.voxel_size,
            vbg.sdf_trunc,
            depth_max,
            weight_max,
        )
        vbg = dataclasses.replace(vbg, tw=tw.at[C].set(0), color=(
            color_arr.at[C].set(0) if vbg.has_color else vbg.color
        ))

        from open3d_tpu.core.masking import compact_indices

        valid_key = (block_keys[:, 0] != 0) | (block_keys[:, 1] != 0)
        unfit = valid_key & ok & (fit == 0)

        if not os.environ.get("O3DTPU_INTEGRATE_V1"):
            # big-window Pallas pass: near blocks whose footprint exceeds
            # the (VWIN, 128) window, guaranteed-covered up to ~193x257 px
            # (z >= ~0.45 m at TUM intrinsics)
            v0b, u0b, shiftb, fitb = pint.block_slab_fit(
                coords, intrinsic, extrinsic, vbg.voxel_size,
                valign=_p2._VALIGN, vwin=_p2._VWIN_BIG, uwin=_p2._UWIN_BIG,
                hp=hp, wp=wp,
            )
            big_mask = unfit & (fitb == 1)
            BC = _p2._BIG_CAPACITY
            b_idx, b_count = compact_indices(big_mask, BC)
            b_live = jnp.arange(BC) < jnp.minimum(b_count, BC)
            safe_b = jnp.maximum(b_idx, 0)
            slots_b = jnp.where(b_live, rows[safe_b], C).astype(jnp.int32)
            coords_b = jnp.where(b_live[:, None], coords[safe_b], 0)
            tw, color_arr = _p2.integrate_blocks_v2(
                vbg.tw,
                vbg.color,
                slots_b,
                coords_b,
                v0b[safe_b],
                u0b[safe_b],
                shiftb[safe_b],
                jnp.where(b_live, fitb[safe_b], 0),
                planes,
                intrinsic,
                extrinsic,
                vbg.voxel_size,
                vbg.sdf_trunc,
                depth_max,
                weight_max,
                vwin=_p2._VWIN_BIG,
                uwin=_p2._UWIN_BIG,
                group=_p2._G_BIG,
            )
            vbg = dataclasses.replace(
                vbg,
                tw=tw.at[C].set(0),
                color=color_arr.at[C].set(0) if vbg.has_color else vbg.color,
            )
            # anything still uncovered (z < ~0.45 m, or big-list overflow)
            unfit = unfit & ~big_mask

        # XLA fallback for the rare blocks no window covers
        if fallback_capacity > 0:
            fb_idx, fb_count = compact_indices(unfit, fallback_capacity)
            fb_live = jnp.arange(fallback_capacity) < fb_count
            safe_idx = jnp.maximum(fb_idx, 0)
            fb_keys = jnp.where(fb_live[:, None], block_keys[safe_idx], 0)
            fb_rows = jnp.where(fb_live, rows[safe_idx], C)
            t_new, w_new, c_new = _new_voxel_values(
                vbg, fb_keys, depth, color, intrinsic, extrinsic,
                depth_max, 1.0, fb_live,
            )
            tw, color_arr = _fuse_xla(vbg, fb_rows, t_new, w_new, c_new, weight_max)
            vbg = dataclasses.replace(vbg, tw=tw, color=color_arr)
        return vbg

    tsdf_new, wn, cnew = _new_voxel_values(
        vbg, block_keys, depth, color, intrinsic, extrinsic, depth_max, 1.0, ok
    )
    if use_pallas:
        from open3d_tpu.ops.pallas.tsdf import fuse_blocks

        tw, color_arr = fuse_blocks(
            vbg.tw_flat, vbg.color_flat if cnew is not None else None,
            rows, tsdf_new, wn, cnew, weight_max,
        )
        # restore the dump-row invariant (weight == 0 there; the kernel may
        # have scattered invalid blocks into it)
        tw = tw.at[C].set(0).reshape(vbg.tw.shape)
        if cnew is None:
            color_arr = vbg.color
        else:
            color_arr = color_arr.at[C].set(0).reshape(vbg.color.shape)
    else:
        tw, color_arr = _fuse_xla(vbg, rows, tsdf_new, wn, cnew, weight_max)

    return dataclasses.replace(vbg, tw=tw, color=color_arr)


# ---------------------------------------------------------------------------
# Dense block index: frustum-local block-coord -> value row lookup volume
# ---------------------------------------------------------------------------
#
# The reference raycast kernel does a spatial hash probe per step per ray
# (VoxelBlockGridImpl.h:564+, DeviceHashBackend lookups). On TPU a probe loop
# inside the march is 8+ dependent gathers per sample; instead we rasterize
# the ACTIVE table once per frame into a small dense int32 volume covering
# the camera's [depth_min, depth_max] ball (64^3 cells = 1 MB at the default
# config), after which every sample is exactly ONE dense gather + one payload
# gather. Blocks outside the volume read as unallocated — callers size
# `extent` from depth_max so the frustum is always covered.


class BlockIndex(NamedTuple):
    rows: jnp.ndarray  # (E^3,) int32 value row per cell; C = missing
    origin: jnp.ndarray  # (3,) int32 block coord of cell (0, 0, 0)
    extent: int


def build_block_index(
    vbg: VoxelBlockGrid,
    center_world: jnp.ndarray,
    extent: int,
) -> BlockIndex:
    """Dense row-index volume of `extent`^3 blocks centered at center_world.

    Scatters straight from the full table (slot index == payload row), so
    there is no active-set cap to overflow (round-3 compacted through a
    16384-slot buffer first, which silently dropped blocks on big scenes)."""
    C = vbg.capacity
    E = int(extent)
    occ = hm.occupied_mask(vbg.table)  # (C,)
    coords = hm.unpack_coords(vbg.table)
    origin = (
        jnp.floor(center_world / vbg.block_size).astype(jnp.int32) - E // 2
    )
    rel = coords - origin
    inr = occ & jnp.all((rel >= 0) & (rel < E), axis=-1)
    lin = rel[:, 0] + rel[:, 1] * E + rel[:, 2] * E * E
    rows = (
        jnp.full((E * E * E + 1,), C, jnp.int32)
        .at[jnp.where(inr, lin, E * E * E)]
        .set(jnp.where(inr, jnp.arange(C, dtype=jnp.int32), C), mode="drop")
    )
    return BlockIndex(rows=rows[: E * E * E], origin=origin, extent=E)


def _index_rows(vbg: VoxelBlockGrid, bindex: BlockIndex, block: jnp.ndarray):
    """Block coords (..., 3) -> value rows (...,) via the dense index."""
    E = bindex.extent
    rel = block - bindex.origin
    inr = jnp.all((rel >= 0) & (rel < E), axis=-1)
    lin = rel[..., 0] + rel[..., 1] * E + rel[..., 2] * E * E
    return jnp.where(inr, bindex.rows[jnp.where(inr, lin, 0)], vbg.capacity)


def _sample_voxels_indexed(vbg: VoxelBlockGrid, bindex: BlockIndex, voxel):
    """Nearest-voxel TSDF sample through the dense block index: one dense
    gather + one payload gather (no hash probes)."""
    B = vbg.block_resolution
    block = jnp.floor_divide(voxel, B)
    local = voxel - block * B
    flat = local[..., 0] + local[..., 1] * B + local[..., 2] * B * B
    rows = _index_rows(vbg, bindex, block)
    B3 = B * B * B
    # FLAT 1-D gather (2-D gathers lower to whole-row reads on TPU)
    ts, w = unpack_tw(vbg.tw.reshape(-1)[rows * B3 + flat])
    return ts, w  # dump row keeps w == 0, so missing blocks read as empty


def _sample_tsdf_trilinear_indexed(vbg: VoxelBlockGrid, bindex: BlockIndex, p):
    """Trilinear TSDF through the dense index (see _sample_tsdf_trilinear)."""
    g = p / vbg.voxel_size
    g0 = jnp.floor(g).astype(jnp.int32)
    f = g - g0.astype(jnp.float32)
    ts_acc = jnp.zeros(p.shape[:-1], jnp.float32)
    w_acc = jnp.zeros(p.shape[:-1], jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = jnp.array([dx, dy, dz], jnp.int32)
                wt = (
                    jnp.where(dx, f[..., 0], 1.0 - f[..., 0])
                    * jnp.where(dy, f[..., 1], 1.0 - f[..., 1])
                    * jnp.where(dz, f[..., 2], 1.0 - f[..., 2])
                )
                ts, w = _sample_voxels_indexed(vbg, bindex, g0 + corner)
                alloc = w > 0
                ts_acc = ts_acc + jnp.where(alloc, wt * ts, 0.0)
                w_acc = w_acc + jnp.where(alloc, wt, 0.0)
    return ts_acc / jnp.maximum(w_acc, 1e-6), w_acc


def _sample_color_indexed(vbg: VoxelBlockGrid, bindex: BlockIndex, voxel):
    B = vbg.block_resolution
    block = jnp.floor_divide(voxel, B)
    local = voxel - block * B
    flat = local[..., 0] + local[..., 1] * B + local[..., 2] * B * B
    rows = _index_rows(vbg, bindex, block)
    B3 = B * B * B
    c = unpack_rgb(vbg.color.reshape(-1)[rows * B3 + flat])
    return jnp.where((rows < vbg.capacity)[..., None], c, 0.0)


# ---------------------------------------------------------------------------
# Sampling helpers (hash-probe path: used by one-shot extraction)
# ---------------------------------------------------------------------------


def _sample_voxels(vbg: VoxelBlockGrid, voxel: jnp.ndarray, max_probes: int = 8):
    """Nearest-voxel TSDF sample at integer voxel coords (..., 3).
    Returns (tsdf, weight) with weight 0 where the block is unallocated."""
    B = vbg.block_resolution
    block = jnp.floor_divide(voxel, B)
    local = voxel - block * B
    flat = local[..., 0] + local[..., 1] * B + local[..., 2] * B * B
    slot, found = hm.find(vbg.table, hm.pack_coords(block), max_probes)
    rows = jnp.where(found, slot, vbg.capacity)
    B3 = B * B * B
    ts, w = unpack_tw(vbg.tw.reshape(-1)[rows * B3 + flat])
    return ts, jnp.where(found, w, 0.0)


def _sample_tsdf_trilinear(vbg: VoxelBlockGrid, p: jnp.ndarray, max_probes: int = 8):
    """Trilinearly interpolated TSDF at world positions p (..., 3)
    (ref: the in-kernel trilinear interp of VoxelBlockGridImpl.h raycast).
    Voxel v's sample point is at world v * voxel_size (corner convention,
    matching integrate). Returns (tsdf, wsum) where wsum is the summed
    interpolation weight over ALLOCATED corners (0 = no data)."""
    g = p / vbg.voxel_size
    g0 = jnp.floor(g).astype(jnp.int32)
    f = g - g0.astype(jnp.float32)
    ts_acc = jnp.zeros(p.shape[:-1], jnp.float32)
    w_acc = jnp.zeros(p.shape[:-1], jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = jnp.array([dx, dy, dz], jnp.int32)
                wt = (
                    jnp.where(dx, f[..., 0], 1.0 - f[..., 0])
                    * jnp.where(dy, f[..., 1], 1.0 - f[..., 1])
                    * jnp.where(dz, f[..., 2], 1.0 - f[..., 2])
                )
                ts, w = _sample_voxels(vbg, g0 + corner, max_probes)
                alloc = w > 0
                ts_acc = ts_acc + jnp.where(alloc, wt * ts, 0.0)
                w_acc = w_acc + jnp.where(alloc, wt, 0.0)
    return ts_acc / jnp.maximum(w_acc, 1e-6), w_acc


def _sample_color(vbg: VoxelBlockGrid, voxel: jnp.ndarray, max_probes: int = 8):
    B = vbg.block_resolution
    block = jnp.floor_divide(voxel, B)
    local = voxel - block * B
    flat = local[..., 0] + local[..., 1] * B + local[..., 2] * B * B
    slot, found = hm.find(vbg.table, hm.pack_coords(block), max_probes)
    rows = jnp.where(found, slot, vbg.capacity)
    B3 = B * B * B
    c = unpack_rgb(vbg.color.reshape(-1)[rows * B3 + flat])
    return jnp.where(found[..., None], c, 0.0)


# ---------------------------------------------------------------------------
# Raycast pass 1: per-tile block depth ranges (ref EstimateRange,
# VoxelBlockGridImpl.h:307-560 — fragment rasterization with atomics becomes
# a bounded-footprint scatter-min/max over a fixed tile grid here)
# ---------------------------------------------------------------------------


def estimate_range(
    vbg: VoxelBlockGrid,
    intrinsic: PinholeCameraIntrinsic,
    extrinsic: jnp.ndarray,
    depth_min: float,
    depth_max: float,
    tile: int = 16,
    active_capacity: int = 16384,
    max_tiles_per_block: int = 64,  # 8x8 tile footprint cap
):
    """Rasterize active blocks into per-(tile x tile)-pixel (z_min, z_max).

    Blocks whose projected footprint exceeds the static cap (or that
    straddle the camera plane) widen a GLOBAL fallback range applied to
    every tile — conservative, never misses surface. All active slots are
    scanned for visibility; only frustum-visible blocks enter the
    `active_capacity` working set, and working-set OVERFLOW widens the
    global fallback to the full depth range instead of silently dropping
    blocks (the round-3 16384-cap hole class). Returns
    (z_min (TH, TW), z_max (TH, TW)) with z_min > z_max meaning 'empty'."""
    from open3d_tpu.core.masking import compact_indices

    TH = -(-intrinsic.height // tile)
    TW = -(-intrinsic.width // tile)
    R = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    corners = _CORNER_OFFSETS.astype(jnp.float32) * vbg.block_size  # (8, 3)

    occ = hm.occupied_mask(vbg.table)
    all_coords = hm.unpack_coords(vbg.table)
    z_all = (
        all_coords.astype(jnp.float32)[:, None, :] * vbg.block_size + corners
    ) @ R.T[:, 2:3] + t[2]
    z_all = z_all[..., 0]
    vis_all = occ & (jnp.max(z_all, axis=-1) > depth_min) & (
        jnp.min(z_all, axis=-1) < depth_max
    )
    A = active_capacity
    vidx, vcount = compact_indices(vis_all, A)
    overflowed = vcount > A
    live = jnp.arange(A) < jnp.minimum(vcount, A)
    keys = vbg.table[jnp.maximum(vidx, 0)]
    coords = hm.unpack_coords(keys)  # (A, 3)

    pw = coords.astype(jnp.float32)[:, None, :] * vbg.block_size + corners
    pc = pw @ R.T + t  # (A, 8, 3)
    z = pc[..., 2]
    zsafe = jnp.maximum(z, 1e-6)
    u = pc[..., 0] / zsafe * intrinsic.fx + intrinsic.cx
    v = pc[..., 1] / zsafe * intrinsic.fy + intrinsic.cy

    front = jnp.all(z > 1e-4, axis=-1)  # fully in front
    z0 = jnp.min(z, axis=-1)
    z1 = jnp.max(z, axis=-1)
    vis = live & (z1 > depth_min) & (z0 < depth_max)

    tu0 = jnp.clip(jnp.floor(jnp.min(u, axis=-1) / tile), 0, TW - 1).astype(jnp.int32)
    tu1 = jnp.clip(jnp.floor(jnp.max(u, axis=-1) / tile), 0, TW - 1).astype(jnp.int32)
    tv0 = jnp.clip(jnp.floor(jnp.min(v, axis=-1) / tile), 0, TH - 1).astype(jnp.int32)
    tv1 = jnp.clip(jnp.floor(jnp.max(v, axis=-1) / tile), 0, TH - 1).astype(jnp.int32)
    # fully-offscreen blocks (rect clipped to empty): detect via raw bounds
    on = (jnp.max(u, axis=-1) >= 0) & (jnp.min(u, axis=-1) < intrinsic.width) & (
        jnp.max(v, axis=-1) >= 0
    ) & (jnp.min(v, axis=-1) < intrinsic.height)
    rw = tu1 - tu0 + 1
    rh = tv1 - tv0 + 1
    K = int(max_tiles_per_block)
    KW = 8
    # rh must be bounded too: the scatter enumerates ky in [0, K // KW), so a
    # tall-thin footprint (rw=2, rh=20) would leave tile rows >= K//KW
    # unwritten -> (inf, -inf) ranges -> holes (advisor r2 #1). Tall blocks
    # now take the conservative global-fallback path below.
    fits = front & (rw * rh <= K) & (rw <= KW) & (rh <= K // KW)
    ok = vis & on & front & fits
    # fallback: visible blocks that don't fit (huge footprint / behind-plane)
    fb = vis & front & ~fits & on
    fb_part = vis & live & ~front  # straddles camera plane: unknown footprint
    any_fb = jnp.any(fb | fb_part) | overflowed
    g_zmin = jnp.where(
        any_fb,
        jnp.min(jnp.where(fb | fb_part, jnp.maximum(z0, depth_min), jnp.inf)),
        jnp.inf,
    )
    g_zmax = jnp.where(
        any_fb, jnp.max(jnp.where(fb | fb_part, jnp.minimum(z1, depth_max), -jnp.inf)), -jnp.inf
    )
    # working-set overflow: unseen blocks could be anywhere in range —
    # widen conservatively rather than leave holes
    g_zmin = jnp.where(overflowed, jnp.float32(depth_min), g_zmin)
    g_zmax = jnp.where(overflowed, jnp.float32(depth_max), g_zmax)

    n_tiles = TH * TW
    kk = jnp.arange(K, dtype=jnp.int32)
    kx = kk % KW
    ky = kk // KW
    tx = tu0[:, None] + kx[None, :]
    ty = tv0[:, None] + ky[None, :]
    inside = ok[:, None] & (kx[None, :] < rw[:, None]) & (ky[None, :] < rh[:, None])
    idx = jnp.where(inside, ty * TW + tx, n_tiles).reshape(-1)
    z0b = jnp.broadcast_to(z0[:, None], tx.shape).reshape(-1)
    z1b = jnp.broadcast_to(z1[:, None], tx.shape).reshape(-1)
    zmin_t = jnp.full((n_tiles + 1,), jnp.inf, jnp.float32).at[idx].min(z0b)[:n_tiles]
    zmax_t = jnp.full((n_tiles + 1,), -jnp.inf, jnp.float32).at[idx].max(z1b)[:n_tiles]
    zmin_t = jnp.minimum(zmin_t, g_zmin)
    zmax_t = jnp.maximum(zmax_t, g_zmax)
    return zmin_t.reshape(TH, TW), zmax_t.reshape(TH, TW)


# ---------------------------------------------------------------------------
# Raycast pass 2: range-bounded sphere trace
# ---------------------------------------------------------------------------


class RaycastResult(NamedTuple):
    """Raycast frame outputs (ref: VoxelBlockGrid::RayCast render attrs,
    t/geometry/VoxelBlockGrid.cpp:354-367 — depth/vertex/normal/color/
    index/interp_ratio/mask)."""

    depth: jnp.ndarray  # (H, W) f32, 0 = miss
    vertex: jnp.ndarray  # (H, W, 3) world-frame
    color: jnp.ndarray  # (H, W, 3)
    mask: jnp.ndarray  # (H, W) bool
    normal: Optional[jnp.ndarray] = None  # (H, W, 3) TSDF-gradient normals
    index: Optional[jnp.ndarray] = None  # (H, W, 8) i32 flat voxel ids
    interp_ratio: Optional[jnp.ndarray] = None  # (H, W, 8) trilinear wts


def _gradient_normals(vbg, bindex, p, dirs, mask):
    """Camera-facing TSDF-gradient normals at world points p (N, 3)
    (ref: the in-kernel gradient in VoxelBlockGridImpl.h:740-860)."""
    eps = vbg.voxel_size
    comps = []
    for ax in range(3):
        off = jnp.zeros((3,), jnp.float32).at[ax].set(eps)
        tp, _ = _sample_tsdf_trilinear_indexed(vbg, bindex, p + off)
        tm, _ = _sample_tsdf_trilinear_indexed(vbg, bindex, p - off)
        comps.append(tp - tm)
    g = jnp.stack(comps, axis=-1)
    n = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
    # orient toward the camera (against the ray direction)
    flip = jnp.sum(n * dirs, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    return jnp.where(mask[..., None], n, 0.0)


def _index_ratio_maps(vbg, bindex, p, mask):
    """Per-hit 8-corner flat voxel indices + trilinear weights — the
    differentiable-rendering surface the reference exposes as the
    index/interp_ratio render attrs (VoxelBlockGrid.cpp:354-367). A
    caller can reconstruct d(tsdf)/d(payload) from these alone."""
    B = vbg.block_resolution
    B3 = B * B * B
    g = p / vbg.voxel_size
    g0 = jnp.floor(g).astype(jnp.int32)
    f = g - g0.astype(jnp.float32)
    idxs, wts = [], []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = jnp.array([dx, dy, dz], jnp.int32)
                voxel = g0 + corner
                block = jnp.floor_divide(voxel, B)
                local = voxel - block * B
                flat = local[..., 0] + local[..., 1] * B + local[..., 2] * B * B
                rows = _index_rows(vbg, bindex, block)
                wt = (
                    jnp.where(dx, f[..., 0], 1.0 - f[..., 0])
                    * jnp.where(dy, f[..., 1], 1.0 - f[..., 1])
                    * jnp.where(dz, f[..., 2], 1.0 - f[..., 2])
                )
                found = rows < vbg.capacity
                idxs.append(jnp.where(mask & found, rows * B3 + flat, -1))
                wts.append(jnp.where(mask & found, wt, 0.0))
    return jnp.stack(idxs, axis=-1), jnp.stack(wts, axis=-1)


def raycast(
    vbg: VoxelBlockGrid,
    intrinsic: PinholeCameraIntrinsic,
    extrinsic: jnp.ndarray,
    depth_min: float = 0.1,
    depth_max: float = 3.0,
    max_steps: int = 96,
    with_color: bool = True,
    with_normals: bool = False,
    with_index_ratio: bool = False,
    use_range_map: bool = True,
    max_probes: int = 8,
    use_pallas: Optional[bool] = None,
) -> RaycastResult:
    """Render depth/vertex/color maps by sphere-tracing the TSDF
    (ref: VoxelBlockGrid::RayCast, .cpp:328-402; kernel Impl.h:564-1100).

    On TPU (use_pallas) the march runs in the Pallas tile kernel
    (ops/pallas/raycast.py — per-tile candidate block lists, gather-DMA'd
    payloads, one-hot MXU sampling; ~100x the XLA gather march). The XLA
    path below is the portable reference implementation:
    pass 1 (EstimateRange analog) bounds every ray to its tile's active-block
    depth range; pass 2 marches THROUGH A DENSE BLOCK INDEX (one gather per
    sample instead of a hash-probe loop): unallocated space advances by
    0.5*block_size, allocated space by max(0.75*tsdf*trunc, voxel_size); a
    +-to-- sign change is refined by bisection on the trilinear TSDF + a
    final secant, like the reference's in-kernel trilinear refinement.
    """
    if use_pallas is None:
        from open3d_tpu.core.platform import is_tpu

        use_pallas = is_tpu() and vbg.block_resolution == 16
    if use_pallas:
        return _raycast_pallas(
            vbg, intrinsic, extrinsic, depth_min, depth_max, with_color,
            with_normals, with_index_ratio,
        )
    H, W = intrinsic.height, intrinsic.width
    # `anchor` is a runtime 1.0: multiplying the pixel-ray table by it stops
    # XLA from folding the (H*W, 3) grid into an executable LITERAL — the
    # TPU runtime re-ships literals on every call (~40 MB/s), which measured
    # 30 ms per embedded MB and dominated raycast before this.
    anchor = jnp.where(jnp.isfinite(extrinsic[0, 0]), 1.0, 0.0)
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = (jnp.zeros((H, 1)) + u - intrinsic.cx) / intrinsic.fx * anchor
    y = (v + jnp.zeros((1, W)) - intrinsic.cy) / intrinsic.fy * anchor
    ray_cam = jnp.stack([x, y, jnp.full_like(x, 1.0)], axis=-1).reshape(-1, 3)
    R = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    origin = -R.T @ t
    dirs = ray_cam @ R  # world, per unit z-depth
    inv_vs = 1.0 / vbg.voxel_size
    N = dirs.shape[0]

    # dense frustum-local index: extent covers the depth_max ball (static)
    extent = min(int(2.0 * depth_max / vbg.block_size) + 3, 128)
    bindex = build_block_index(vbg, origin, extent)

    if use_range_map:
        zmin_t, zmax_t = estimate_range(vbg, intrinsic, extrinsic, depth_min, depth_max)
        tile = 16
        ia = (anchor.astype(jnp.int32) - 1)  # runtime 0: defeats literal-folding
        tv = (jnp.arange(H) // tile)[:, None] + ia
        tu = (jnp.arange(W) // tile)[None, :] + ia
        z_start = jnp.maximum(zmin_t[tv, tu] - vbg.sdf_trunc, depth_min).reshape(-1)
        z_end = jnp.minimum(zmax_t[tv, tu] + vbg.sdf_trunc, depth_max).reshape(-1)
    else:
        z_start = jnp.full((N,), depth_min, jnp.float32)
        z_end = jnp.full((N,), depth_max, jnp.float32)

    def sample(z):
        p = origin + dirs * z[:, None]
        voxel = jnp.floor(p * inv_vs).astype(jnp.int32)
        return _sample_voxels_indexed(vbg, bindex, voxel)

    def cond(carry):
        z, prev_t, prev_z, z_lo, z_hi, done, it = carry
        return (it < max_steps) & ~jnp.all(done)

    def body(carry):
        z, prev_t, prev_z, z_lo, z_hi, done, it = carry
        ts, w = sample(z)
        alloc = w > 0
        # hit: previous sample positive, current negative — keep the bracket
        crossing = alloc & (prev_t > 0) & (ts <= 0) & ~done
        z_lo = jnp.where(crossing, prev_z, z_lo)
        z_hi = jnp.where(crossing, z, z_hi)
        done = done | crossing | (z > z_end)
        # conservative marching: the projective TSDF over-estimates euclidean
        # distance (tunnels at grazing incidence), so advance by 3/4 of it;
        # unallocated space advances by half a block so a one-block-thick
        # shell cannot be jumped over.
        step = jnp.where(
            alloc,
            jnp.maximum(0.75 * ts * vbg.sdf_trunc, vbg.voxel_size),
            0.5 * vbg.block_size,
        )
        prev_t = jnp.where(alloc, ts, 1.0)  # reset interp base in empty space
        prev_z = z
        z = jnp.where(done, z, z + step)
        return z, prev_t, prev_z, z_lo, z_hi, done, it + 1

    z0 = z_start
    init = (
        z0,
        jnp.ones((N,), jnp.float32),
        z0,
        jnp.zeros((N,), jnp.float32),
        jnp.zeros((N,), jnp.float32),
        z_start >= z_end,
        jnp.zeros((), jnp.int32),
    )
    _, _, _, z_lo, z_hi, _, _ = jax.lax.while_loop(cond, body, init)

    hit = z_hi > 0
    # sub-voxel refinement: bisection on the TRILINEAR tsdf inside the bracket
    # (the reference refines with trilinear interpolation in-kernel,
    # VoxelBlockGridImpl.h:740-860); 3 rounds + secant.
    t_lo = jnp.ones((N,), jnp.float32)
    t_hi = -jnp.ones((N,), jnp.float32)
    for _ in range(4):
        zm = 0.5 * (z_lo + z_hi)
        tm, wm = _sample_tsdf_trilinear_indexed(vbg, bindex, origin + dirs * zm[:, None])
        known = wm > 0.25  # unknown samples must not move the bracket
        neg = (tm <= 0) & known
        pos = (tm > 0) & known
        z_hi = jnp.where(hit & neg, zm, z_hi)
        t_hi = jnp.where(hit & neg, tm, t_hi)
        z_lo = jnp.where(hit & pos, zm, z_lo)
        t_lo = jnp.where(hit & pos, tm, t_lo)
    # final secant inside the last bracket
    hit_z = z_lo + t_lo / jnp.maximum(t_lo - t_hi, 1e-6) * (z_hi - z_lo)
    hit_z = jnp.where(hit, hit_z, 0.0)

    mask = hit_z > 0
    depth_img = jnp.where(mask, hit_z, 0.0).reshape(H, W)
    p_hit = origin + dirs * hit_z[:, None]
    vertex = jnp.where(mask[:, None], p_hit, 0.0).reshape(H, W, 3)
    if with_color and vbg.has_color:
        voxel = jnp.floor(p_hit * inv_vs).astype(jnp.int32)
        col = _sample_color_indexed(vbg, bindex, voxel)
        color_img = jnp.where(mask[:, None], col, 0.0).reshape(H, W, 3)
    else:
        color_img = jnp.zeros((H, W, 3), jnp.float32)
    normal_img = None
    if with_normals:
        nrm = _gradient_normals(vbg, bindex, p_hit, dirs, mask)
        normal_img = nrm.reshape(H, W, 3)
    index_img = ratio_img = None
    if with_index_ratio:
        idx8, wt8 = _index_ratio_maps(vbg, bindex, p_hit, mask)
        index_img = idx8.reshape(H, W, 8)
        ratio_img = wt8.reshape(H, W, 8)
    return RaycastResult(
        depth=depth_img, vertex=vertex, color=color_img,
        mask=mask.reshape(H, W), normal=normal_img, index=index_img,
        interp_ratio=ratio_img,
    )


def _raycast_pallas(
    vbg: VoxelBlockGrid,
    intrinsic: PinholeCameraIntrinsic,
    extrinsic: jnp.ndarray,
    depth_min: float,
    depth_max: float,
    with_color: bool,
    with_normals: bool = False,
    with_index_ratio: bool = False,
) -> RaycastResult:
    """TPU fast path: Pallas tile-march depth + XLA map assembly."""
    from open3d_tpu.ops.pallas import raycast as prc

    H, W = intrinsic.height, intrinsic.width
    depth_img, _ = prc.raycast_depth(
        vbg, intrinsic, extrinsic, depth_min=depth_min, depth_max=depth_max
    )
    mask = depth_img > 0
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = (jnp.zeros((H, 1)) + u - intrinsic.cx) / intrinsic.fx
    y = (v + jnp.zeros((1, W)) - intrinsic.cy) / intrinsic.fy
    R = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    origin = -R.T @ t
    dirs = jnp.stack([x, y, jnp.ones_like(x)], axis=-1) @ R
    p_hit = origin + dirs * depth_img[..., None]
    vertex = jnp.where(mask[..., None], p_hit, 0.0)
    need_index = (with_color and vbg.has_color) or with_normals or with_index_ratio
    bindex = None
    if need_index:
        extent = min(int(2.0 * depth_max / vbg.block_size) + 3, 128)
        bindex = build_block_index(vbg, origin, extent)
    if with_color and vbg.has_color:
        voxel = jnp.floor(p_hit / vbg.voxel_size).astype(jnp.int32)
        col = _sample_color_indexed(vbg, bindex, voxel.reshape(-1, 3))
        color_img = jnp.where(mask[..., None], col.reshape(H, W, 3), 0.0)
    else:
        color_img = jnp.zeros((H, W, 3), jnp.float32)
    normal_img = None
    if with_normals:
        nrm = _gradient_normals(
            vbg, bindex, p_hit.reshape(-1, 3), dirs.reshape(-1, 3),
            mask.reshape(-1),
        )
        normal_img = nrm.reshape(H, W, 3)
    index_img = ratio_img = None
    if with_index_ratio:
        idx8, wt8 = _index_ratio_maps(
            vbg, bindex, p_hit.reshape(-1, 3), mask.reshape(-1)
        )
        index_img = idx8.reshape(H, W, 8)
        ratio_img = wt8.reshape(H, W, 8)
    return RaycastResult(
        depth=depth_img, vertex=vertex, color=color_img, mask=mask,
        normal=normal_img, index=index_img, interp_ratio=ratio_img,
    )


# ---------------------------------------------------------------------------
# Extraction
# ---------------------------------------------------------------------------


def extract_point_cloud(
    vbg: VoxelBlockGrid,
    point_capacity: int = 262144,
    weight_threshold: float = 3.0,
) -> PointCloud:
    """Zero-crossing surface points with gradient normals
    (ref: VoxelBlockGrid::ExtractPointCloud, .cpp:404-434; kernel
    Impl.h ExtractPointCloud — 27-neighbor block tables become vectorized
    hash finds on the +x/+y/+z face slabs here).
    """
    B = vbg.block_resolution
    B3 = B**3
    C = vbg.capacity
    occ = hm.occupied_mask(vbg.table)
    coords = hm.unpack_coords(vbg.table)  # (C, 3), garbage where unoccupied
    local = _voxel_local_coords(B)  # (B3, 3)

    # neighbor voxel value t(v + e_axis) for every voxel of every block:
    # in-block shift where possible, +axis neighbor block's face slab else.
    def neighbor_vals(axis):
        e = jnp.zeros((3,), jnp.int32).at[axis].set(1)
        nb_slot, nb_found = hm.find(vbg.table, hm.pack_coords(coords + e))
        nb_rows = jnp.where(nb_found & occ, nb_slot, C)
        nxt = local + e
        inside = nxt[:, axis] < B
        wrapped = jnp.where(inside[:, None], nxt, nxt - e * B)
        flat = wrapped[:, 0] + wrapped[:, 1] * B + wrapped[:, 2] * B * B
        own = jnp.arange(C)
        tw2d = vbg.tw_flat
        t_in, w_in = unpack_tw(tw2d[own[:, None], flat[None, :]])
        t_out, w_out = unpack_tw(tw2d[nb_rows[:, None], flat[None, :]])
        tn = jnp.where(inside[None, :], t_in, t_out)
        wn = jnp.where(inside[None, :], w_in, w_out)
        return tn, wn

    t0, w0 = unpack_tw(vbg.tw_flat[:C])
    points = []
    norms = []
    cols = []
    masks = []
    txs, wxs = [], []
    for axis in range(3):
        tn, wn = neighbor_vals(axis)
        txs.append(tn)
        wxs.append(wn)
    # gradient for normals from forward differences
    grad = jnp.stack([txs[0] - t0, txs[1] - t0, txs[2] - t0], axis=-1)
    gnorm = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)

    base_w_ok = occ[:, None] & (w0 >= weight_threshold)
    origin = coords.astype(jnp.float32) * vbg.block_size
    vpos = origin[:, None, :] + local.astype(jnp.float32)[None, :, :] * vbg.voxel_size

    for axis in range(3):
        tn, wn = txs[axis], wxs[axis]
        cross = base_w_ok & (wn >= weight_threshold) & (t0 * tn < 0)
        denom = t0 - tn  # sign-preserving: clamping with max() breaks t0 < 0
        frac = jnp.clip(t0 / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9), 0.0, 1.0)
        e = jnp.zeros((3,), jnp.float32).at[axis].set(vbg.voxel_size)
        p = vpos + frac[..., None] * e
        points.append(p.reshape(-1, 3))
        norms.append(gnorm.reshape(-1, 3))
        masks.append(cross.reshape(-1))
        if vbg.has_color:
            cols.append(unpack_rgb(vbg.color_flat[:C]).reshape(-1, 3))

    pts = jnp.concatenate(points, axis=0)
    nrm = jnp.concatenate(norms, axis=0)
    msk = jnp.concatenate(masks, axis=0)

    # compact into the fixed-capacity output cloud
    from open3d_tpu.core.masking import compact_indices

    idx, count = compact_indices(msk, point_capacity)
    sel_mask = jnp.arange(point_capacity) < count
    out_pos = jnp.where(sel_mask[:, None], pts[idx], FAR_COORD)
    attrs = {"normals": jnp.where(sel_mask[:, None], nrm[idx], 0.0)}
    if cols:
        cc = jnp.concatenate(cols, axis=0)
        attrs["colors"] = jnp.where(sel_mask[:, None], cc[idx], 0.0)
    return PointCloud(positions=out_pos, mask=sel_mask, attrs=attrs)


# ---------------------------------------------------------------------------
# Triangle mesh extraction: marching tetrahedra
# ---------------------------------------------------------------------------
#
# Reference: VoxelBlockGrid::ExtractTriangleMesh (.cpp:436+) runs classic
# marching cubes with the 256-case constant table
# (pipelines/integration/MarchingCubesConst.h) and a shared-vertex map built
# from per-edge atomics. TPU design: *marching tetrahedra* instead — each
# cube splits into 6 tetrahedra along the 0-7 diagonal; the 16-case tet
# table is generated programmatically below (no big constant table, no
# atomics), every case emits <= 2 triangles, and output compaction is a
# cumsum-offset scatter inside a lax.scan over block chunks. The resulting
# surface is the same zero-level set, triangulated ~2x finer.

import numpy as _np


def _tet_tables():
    """16-case marching-tetrahedra table: (case, tri<=2, corner_pair(3, 2)).

    Corner ids are within the tetrahedron (0..3); -1 pads unused slots."""
    edges = _np.full((16, 2, 3, 2), -1, _np.int32)
    count = _np.zeros((16,), _np.int32)
    for mask in range(16):
        ins = [i for i in range(4) if mask >> i & 1]
        outs = [i for i in range(4) if not (mask >> i & 1)]
        tris = []
        if len(ins) == 1:
            i = ins[0]
            tris.append([(i, outs[0]), (i, outs[1]), (i, outs[2])])
        elif len(ins) == 3:
            o = outs[0]
            tris.append([(o, ins[0]), (o, ins[1]), (o, ins[2])])
        elif len(ins) == 2:
            i, j = ins
            k, l = outs
            tris.append([(i, k), (i, l), (j, l)])
            tris.append([(i, k), (j, l), (j, k)])
        for t, tri in enumerate(tris):
            for e, pair in enumerate(tri):
                edges[mask, t, e] = pair
        count[mask] = len(tris)
    return jnp.asarray(edges), jnp.asarray(count)


_TET_EDGES, _TET_COUNT = _tet_tables()
# 6-tet decomposition of the cube around the 0-7 diagonal; cube corner id
# bit layout: bit0 = +x, bit1 = +y, bit2 = +z.
_CUBE_TETS = jnp.asarray(
    [[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]],
    jnp.int32,
)
_CORNER_OFFSETS = jnp.asarray(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], jnp.int32
)


def extract_triangle_mesh(
    vbg: VoxelBlockGrid,
    triangle_capacity: int = 262144,
    weight_threshold: float = 3.0,
    block_chunk: int = 8,
    indexed: bool = True,
):
    """Zero-level-set mesh with SHARED-VERTEX topology.

    Every marching-tetrahedra vertex lies on a tet edge, i.e. between two
    global voxel-grid corners; the canonicalized corner pair is a globally
    unique key, so duplicate vertices (the same edge hit by up to 6 tets x
    adjacent cubes) are merged by one lexicographic sort over the 6-int32
    keys + cumsum unique-ids — the sort-based TPU replacement for the
    reference's per-edge-atomic shared vertex map
    (t/geometry/kernel/VoxelBlockGridImpl.h:1369+). `indexed=False` returns
    the raw fixed-capacity soup (one dedup sort cheaper; 6x duplicated
    vertices).

    Returns a geometry.trianglemesh.TriangleMesh whose triangle_mask marks
    live triangles (ref API: VoxelBlockGrid::ExtractTriangleMesh,
    VoxelBlockGrid.h:200-212 — estimated_vertex_number plays the same role
    as triangle_capacity here)."""
    from open3d_tpu.geometry.trianglemesh import TriangleMesh

    B = vbg.block_resolution
    B3 = B**3
    C = vbg.capacity
    occ = hm.occupied_mask(vbg.table)
    coords = hm.unpack_coords(vbg.table)  # (C, 3)
    local = _voxel_local_coords(B)  # (B3, 3)
    has_color = vbg.has_color

    G = int(block_chunk)
    n_chunks = -(-C // G)
    pad = n_chunks * G - C
    rows_all = jnp.arange(C, dtype=jnp.int32)
    if pad:
        rows_all = jnp.concatenate([rows_all, jnp.full((pad,), C, jnp.int32)])
    rows_all = rows_all.reshape(n_chunks, G)

    # 8 neighbor-block rows per block: offset bit k set -> +1 in axis k
    nb_offsets = _CORNER_OFFSETS  # (8, 3) reuse: same bit layout

    # flat 2-D payload views hoisted out of the chunk scan (one re-tiling)
    tw2d = vbg.tw_flat
    col2d = vbg.color_flat

    def chunk_triangles(rows):
        """rows (G,) -> tri_verts (M, 3, 3), tri_col (M, 3, 3), valid (M,),
        tri_keys (M, 3, 6) canonical (lo-corner, hi-corner) voxel ids."""
        blk_occ = jnp.where(rows < C, occ[jnp.minimum(rows, C - 1)], False)
        bco = coords[jnp.minimum(rows, C - 1)]  # (G, 3)
        nb_keys = hm.pack_coords(bco[:, None, :] + nb_offsets[None, :, :])  # (G, 8, 2)
        nb_slot, nb_found = hm.find(vbg.table, nb_keys.reshape(-1, 2))
        nb_rows = jnp.where(nb_found, nb_slot, C).reshape(G, 8)
        nb_rows = nb_rows.at[:, 0].set(jnp.where(blk_occ, rows, C))

        # cube corner samples for every voxel: (G, B3, 8)
        nxt = local[:, None, :] + _CORNER_OFFSETS[None, :, :]  # (B3, 8, 3)
        overflow = (nxt >= B).astype(jnp.int32)
        wrapped = nxt - overflow * B
        flat = wrapped[..., 0] + wrapped[..., 1] * B + wrapped[..., 2] * B * B  # (B3, 8)
        which = overflow[..., 0] + 2 * overflow[..., 1] + 4 * overflow[..., 2]  # (B3, 8)
        row_idx = nb_rows[:, which]  # (G, B3, 8)
        tsdf_c, w_c = unpack_tw(tw2d[row_idx, flat[None]])  # (G, B3, 8)
        if has_color:
            col_c = unpack_rgb(col2d[row_idx, flat[None]])  # (G, B3, 8, 3)

        corner_pos = (
            (bco[:, None, None, :] * B + nxt[None]).astype(jnp.float32) * vbg.voxel_size
        )  # (G, B3, 8, 3)

        cube_ok = blk_occ[:, None] & jnp.all(w_c >= weight_threshold, axis=-1)

        # tets: gather 4 corners each -> (G, B3, 6, 4)
        tv = tsdf_c[:, :, _CUBE_TETS]  # values
        tp = corner_pos[:, :, _CUBE_TETS]  # (G, B3, 6, 4, 3)
        inside = (tv < 0).astype(jnp.int32)
        case = inside[..., 0] + 2 * inside[..., 1] + 4 * inside[..., 2] + 8 * inside[..., 3]

        pairs = _TET_EDGES[case]  # (G, B3, 6, 2, 3, 2)
        n_tri = _TET_COUNT[case]  # (G, B3, 6)
        ca = jnp.maximum(pairs[..., 0], 0)
        cb = jnp.maximum(pairs[..., 1], 0)
        # canonicalize edge orientation by GLOBAL corner id before
        # interpolating: the same physical edge is emitted by several tets /
        # neighbor cubes with either endpoint first ((inside, outside) vs
        # (outside, inside) in the 3-in case), and a + f*(b-a) from opposite
        # ends differs by ~1 ulp — enough to break sort-based vertex dedup.
        gco = bco[:, None, None, :] * B + nxt[None]  # (G, B3, 8, 3) int32
        gct = gco[:, :, _CUBE_TETS]  # (G, B3, 6, 4, 3)
        ka = jnp.take_along_axis(
            gct[:, :, :, None, None, :, :], ca[..., None, None], axis=-2
        )[..., 0, :]  # (G, B3, 6, 2, 3, 3)
        kb = jnp.take_along_axis(
            gct[:, :, :, None, None, :, :], cb[..., None, None], axis=-2
        )[..., 0, :]
        d0, d1, d2 = (ka[..., j] - kb[..., j] for j in range(3))
        swap = (d0 > 0) | ((d0 == 0) & ((d1 > 0) | ((d1 == 0) & (d2 > 0))))
        ca, cb = jnp.where(swap, cb, ca), jnp.where(swap, ca, cb)
        keys = jnp.concatenate(
            [jnp.where(swap[..., None], kb, ka), jnp.where(swap[..., None], ka, kb)],
            axis=-1,
        )  # (G, B3, 6, 2, 3, 6) canonical (lo, hi) corner ids
        va = jnp.take_along_axis(tv[..., None, None, :], ca[..., None], axis=-1)[..., 0]
        vb = jnp.take_along_axis(tv[..., None, None, :], cb[..., None], axis=-1)[..., 0]
        frac = va / jnp.where(jnp.abs(va - vb) > 1e-12, va - vb, 1.0)
        frac = jnp.clip(frac, 0.0, 1.0)[..., None]  # (G, B3, 6, 2, 3, 1)
        pa = jnp.take_along_axis(
            tp[:, :, :, None, None, :, :], ca[..., None, None], axis=-2
        )[..., 0, :]
        pb = jnp.take_along_axis(
            tp[:, :, :, None, None, :, :], cb[..., None, None], axis=-2
        )[..., 0, :]
        verts = pa + frac * (pb - pa)  # (G, B3, 6, 2, 3, 3)
        valid = (
            cube_ok[:, :, None, None]
            & (jnp.arange(2)[None, None, None, :] < n_tri[..., None])
        )  # (G, B3, 6, 2)
        if has_color:
            cv = col_c[:, :, _CUBE_TETS]  # (G, B3, 6, 4, 3)
            cca = jnp.take_along_axis(
                cv[:, :, :, None, None, :, :], ca[..., None, None], axis=-2
            )[..., 0, :]
            ccb = jnp.take_along_axis(
                cv[:, :, :, None, None, :, :], cb[..., None, None], axis=-2
            )[..., 0, :]
            cols = cca + frac * (ccb - cca)
        else:
            cols = jnp.zeros_like(verts)
        M = G * B3 * 6 * 2
        return (
            verts.reshape(M, 3, 3),
            cols.reshape(M, 3, 3),
            valid.reshape(M),
            keys.reshape(M, 3, 6),
        )

    Tcap = int(triangle_capacity)
    out_v = jnp.zeros((Tcap + 1, 3, 3), jnp.float32)
    out_c = jnp.zeros((Tcap + 1, 3, 3), jnp.float32)
    out_k = jnp.zeros((Tcap + 1, 3, 6), jnp.int32)

    def scan_body(carry, rows):
        out_v, out_c, out_k, offset = carry
        verts, cols, valid, keys = chunk_triangles(rows)
        pos = offset + jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
        dst = jnp.where(valid & (pos < Tcap), pos, Tcap)
        out_v = out_v.at[dst].set(verts)
        out_c = out_c.at[dst].set(cols)
        out_k = out_k.at[dst].set(keys)
        return (out_v, out_c, out_k, offset + jnp.sum(valid.astype(jnp.int32))), None

    (out_v, out_c, out_k, total), _ = jax.lax.scan(
        scan_body, (out_v, out_c, out_k, jnp.int32(0)), rows_all
    )
    tri_mask = jnp.arange(Tcap) < jnp.minimum(total, Tcap)
    if not indexed:
        return TriangleMesh.from_triangle_soup(
            out_v[:Tcap], tri_mask, colors=out_c[:Tcap] if has_color else None
        )
    return _index_soup(
        out_v[:Tcap], out_c[:Tcap] if has_color else None, out_k[:Tcap], tri_mask
    )


def _index_soup(tri_verts, tri_cols, tri_keys, tri_mask):
    """Merge soup vertices that share a canonical edge key into an indexed
    mesh (fixed capacity N = 3T vertices; vertex_mask marks the live ones).

    One 6-key lexicographic sort + cumsum assigns unique ids; positions of
    first occurrences are scattered into the unique slots (duplicates are
    bit-identical so any representative works)."""
    from open3d_tpu.geometry.trianglemesh import TriangleMesh

    T = tri_verts.shape[0]
    N = 3 * T
    keys = tri_keys.reshape(N, 6)
    vvalid = jnp.repeat(tri_mask, 3)
    # invalid soup slots sort to the end (key column 0 = INT32_MAX)
    imax = jnp.int32(2**31 - 1)
    k0 = jnp.where(vvalid, keys[:, 0], imax)
    idx = jnp.arange(N, dtype=jnp.int32)
    sorted_cols = jax.lax.sort(
        (k0, keys[:, 1], keys[:, 2], keys[:, 3], keys[:, 4], keys[:, 5], idx),
        num_keys=6,
    )
    sidx = sorted_cols[6]
    sk = jnp.stack(sorted_cols[:6], axis=-1)  # (N, 6) sorted keys
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(sk[1:] != sk[:-1], axis=-1)]
    )
    uid_sorted = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # (N,)
    svalid = vvalid[sidx]
    n_unique = jnp.sum((is_new & svalid).astype(jnp.int32))
    # unique id per original soup vertex (invalids land past n_unique)
    uid = jnp.zeros((N,), jnp.int32).at[sidx].set(uid_sorted)
    verts = jnp.zeros((N, 3), jnp.float32).at[uid_sorted].set(
        tri_verts.reshape(N, 3)[sidx]
    )
    vattrs = {}
    if tri_cols is not None:
        vattrs["colors"] = jnp.zeros((N, 3), jnp.float32).at[uid_sorted].set(
            tri_cols.reshape(N, 3)[sidx]
        )
    triangles = uid.reshape(T, 3)
    vertex_mask = jnp.arange(N) < n_unique
    return TriangleMesh(
        vertices=verts,
        triangles=triangles,
        vertex_mask=vertex_mask,
        triangle_mask=tri_mask,
        vertex_attrs=vattrs,
        triangle_attrs={},
    )
