"""Bisect the _new_voxel_values cost on TPU."""
import time
import jax, jax.numpy as jnp
from open3d_tpu.data import synthetic
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.core import hashmap as hm
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic


def timeit(name, f, *a, n=10):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*a))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    return out


intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
depths, colors, extr, _ = synthetic.render_sequence(1, intrinsic=intr, span=0.2)
depth, color, E = depths[0], colors[0], extr[0]
vbg = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16, block_count=40960)
M, B = 1024, 16
B3 = B ** 3

touch = jax.jit(lambda d, e: vbg_mod.compute_unique_block_coordinates(
    vbg, d, intr, e, depth_max=3.0, frame_block_capacity=M))
keys, cnt = jax.block_until_ready(touch(depth, E))

coords = hm.unpack_coords(keys)
local = vbg_mod._voxel_local_coords(B)

# stage A: projection only (no gathers)
@jax.jit
def stage_proj(keys, E):
    coords = hm.unpack_coords(keys)
    origin = coords.astype(jnp.float32) * vbg.block_size
    pw = origin[:, None, :] + local.astype(jnp.float32) * vbg.voxel_size
    R = E[:3, :3]; t = E[:3, 3]
    pc = pw @ R.T + t
    z = pc[..., 2]
    u = pc[..., 0] / jnp.maximum(z, 1e-6) * intr.fx + intr.cx
    v = pc[..., 1] / jnp.maximum(z, 1e-6) * intr.fy + intr.cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (z > 1e-4) & (ui >= 0) & (ui < intr.width) & (vi >= 0) & (vi < intr.height)
    lin = jnp.where(inb, vi * intr.width + jnp.clip(ui, 0, intr.width - 1), 0)
    return lin, z, inb

lin, z, inb = timeit("A proj->lin", stage_proj, keys, E)

# stage B: depth gather only
@jax.jit
def stage_gather(lin, depth):
    return depth.reshape(-1)[lin]

d = timeit("B depth gather", stage_gather, lin, depth)

# stage C: color pack + gather
@jax.jit
def stage_cgather(lin, color):
    cp = vbg_mod.pack_rgb(color).reshape(-1)
    return cp[lin]

timeit("C color pack+gather", stage_cgather, lin, color)

# stage D: tsdf compute from d, z
@jax.jit
def stage_tsdf(d, z, inb):
    d_ok = inb & (d > 0) & (d < 3.0)
    sdf = d - z
    keep = d_ok & (sdf >= -vbg.sdf_trunc)
    tsdf_new = jnp.clip(sdf / vbg.sdf_trunc, -1.0, 1.0)
    return tsdf_new, keep.astype(jnp.float32)

timeit("D tsdf ew", stage_tsdf, d, z, inb)

# full fused
@jax.jit
def full(keys, depth, color, E):
    ok = jnp.ones((M,), bool)
    return vbg_mod._new_voxel_values(vbg, keys, depth, color, intr, E, 3.0, 1.0, ok)

timeit("FULL _new_voxel_values", full, keys, depth, color, E)

# raw microbench again for device health
x = jnp.ones((1024, 1024))
mm = jax.jit(lambda x: (x @ x).sum())
timeit("matmul 1k health", mm, x, n=20)
lin1 = jnp.reshape(lin, (-1,))
g1 = jax.jit(lambda dflat, l: dflat[l].sum())
timeit("gather1d 4.2M health", g1, depth.reshape(-1), lin1, n=10)
