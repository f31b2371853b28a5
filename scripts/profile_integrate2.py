"""Break down the integrate step: pallas kernel alone vs activate vs fallback."""
import time
from functools import partial

import jax
import jax.numpy as jnp

from open3d_tpu.data import synthetic
from open3d_tpu.core import hashmap as hm
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.ops.pallas import integrate as pint

intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
depths, colors, extr, _ = synthetic.render_sequence(4, intrinsic=intr, span=0.2)
depths = jax.block_until_ready(depths)
vbg = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16, block_count=40960,
                     with_color=True)
FBC = 1024


def timeit(name, f, *a, n=10):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    return out


touch = jax.jit(lambda v, d, e: vbg_mod.compute_unique_block_coordinates(
    v, d, intr, e, depth_max=3.0, frame_block_capacity=FBC))
keys, cnt = touch(vbg, depths[0], extr[0])
print("touched:", int(cnt), flush=True)
table, slot, ok = jax.jit(hm.activate)(vbg.table, keys)
import dataclasses
vbg = dataclasses.replace(vbg, table=table)
rows = jnp.where(ok, slot, vbg.capacity)
coords = hm.unpack_coords(keys)

v0, u0, shift, fit = jax.block_until_ready(
    jax.jit(lambda c, e: pint.block_slab_fit(c, intr, e, vbg.voxel_size))(coords, extr[0]))
print("fit:", int(jnp.sum(fit)), "of", FBC, "shifted:", int(jnp.sum(shift)), flush=True)
planes = jax.block_until_ready(
    jax.jit(lambda d, c: pint.prepare_planes(d, c, True))(depths[0], colors[0]))

timeit("prepare_planes", jax.jit(lambda d, c: pint.prepare_planes(d, c, True)),
       depths[0], colors[0])
timeit("block_slab_fit", jax.jit(lambda c, e: pint.block_slab_fit(c, intr, e, vbg.voxel_size)),
       coords, extr[0])

kernel = jax.jit(lambda tw, col, r, c, v0_, u0_, s_, f_, p, e: pint.integrate_blocks(
    tw, col, r, c, v0_, u0_, s_, f_, p, intr, e, vbg.voxel_size, vbg.sdf_trunc, 3.0))
timeit("pallas kernel (M=%d)" % FBC, kernel, vbg.tw, vbg.color, rows, coords,
       v0, u0, shift, fit, planes, extr[0])

# no-color variant
kernel_nc = jax.jit(lambda tw, r, c, v0_, u0_, s_, f_, p, e: pint.integrate_blocks(
    tw, jnp.zeros((vbg.capacity + 1, 0), jnp.int32), r, c, v0_, u0_, s_, f_, p, intr, e,
    vbg.voxel_size, vbg.sdf_trunc, 3.0))
timeit("pallas kernel no-color", kernel_nc, vbg.tw, rows, coords, v0, u0, shift, fit,
       planes, extr[0])

integ = partial(jax.jit, donate_argnums=(0,))(
    lambda v, k, d, c, e: vbg_mod.integrate(v, k, d, c, intr, e, depth_max=3.0))
out = jax.block_until_ready(integ(vbg, keys, depths[0], colors[0], extr[0]))
t0 = time.perf_counter()
for _ in range(10):
    out = integ(out, keys, depths[0], colors[0], extr[0])
jax.block_until_ready(out)
print(f"integrate full (donated): {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)

integ_nofb = partial(jax.jit, donate_argnums=(0,))(
    lambda v, k, d, c, e: vbg_mod.integrate(v, k, d, c, intr, e, depth_max=3.0,
                                            fallback_capacity=0))
out = jax.block_until_ready(integ_nofb(out, keys, depths[0], colors[0], extr[0]))
t0 = time.perf_counter()
for _ in range(10):
    out = integ_nofb(out, keys, depths[0], colors[0], extr[0])
jax.block_until_ready(out)
print(f"integrate no-fallback (donated): {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)
