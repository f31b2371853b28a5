"""Fine-grained timing of integrate/raycast sub-pieces on TPU."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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
depths, colors, extr, _ = synthetic.render_sequence(2, intrinsic=intr, span=0.2)
depths = jax.block_until_ready(depths)
vbg = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16, block_count=40960)
FBC = 1024

touch = jax.jit(lambda vbg, d, e: vbg_mod.compute_unique_block_coordinates(
    vbg, d, intr, e, depth_max=3.0, frame_block_capacity=FBC))
keys, cnt = jax.block_until_ready(touch(vbg, depths[0], extr[0]))
print("touched:", int(cnt), flush=True)

# activate with different round counts
for r in (4, 8, 16):
    act = jax.jit(partial(hm.activate, max_rounds=r))
    timeit(f"activate rounds={r}", act, vbg.table, keys)

table, slot, ok = jax.block_until_ready(hm.activate(vbg.table, keys))
rows = jnp.where(ok, slot, vbg.capacity)

# sampling stage alone
samp = jax.jit(lambda vbg, keys, d, c, e, ok: vbg_mod._new_voxel_values(
    vbg, keys, d, c, intr, e, 3.0, 1.0, ok))
tsdf_new, wn, cnew = timeit("sample (proj+gathers)", samp, vbg, keys, depths[0], colors[0], extr[0], ok)

# pallas fuse alone (donated)
from open3d_tpu.ops.pallas.tsdf import fuse_blocks
@partial(jax.jit, donate_argnums=(0, 1))
def fuse(tw, col, rows, tn, wn_, cn):
    return fuse_blocks(tw, col, rows, tn, wn_, cn, 10000.0)

tw, col = jax.block_until_ready(fuse(vbg.tw, vbg.color, rows, tsdf_new, wn, cnew))
t0 = time.perf_counter()
n = 10
for _ in range(n):
    tw, col = fuse(tw, col, rows, tsdf_new, wn, cnew)
jax.block_until_ready(tw)
print(f"pallas fuse (donated): {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)

# XLA fuse alone (donated)
vbg1 = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16, block_count=40960)
@partial(jax.jit, donate_argnums=(0,))
def fuse_x(vbg_, rows, tn, wn_, cn):
    tw, col = vbg_mod._fuse_xla(vbg_, rows, tn, wn_, cn, 10000.0)
    import dataclasses
    return dataclasses.replace(vbg_, tw=tw, color=col)

vbg1 = jax.block_until_ready(fuse_x(vbg1, rows, tsdf_new, wn, cnew))
t0 = time.perf_counter()
for _ in range(n):
    vbg1 = fuse_x(vbg1, rows, tsdf_new, wn, cnew)
jax.block_until_ready(vbg1.tw)
print(f"xla fuse (donated): {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)

# find cost: vectorized probes vs loop  (raycast inner op)
N = 640 * 480
q = hm.pack_coords(jax.random.randint(jax.random.PRNGKey(0), (N, 3), -20, 20))
fnd = jax.jit(lambda t, q: hm.find(t, q, 8))
timeit("find 307k x 8 probes (fori)", fnd, table, q, n=5)

# single range-map pass
er = jax.jit(lambda vbg, e: vbg_mod.estimate_range(vbg, intr, e, 0.1, 3.0))
import dataclasses
vbg2 = dataclasses.replace(vbg, table=table)
timeit("estimate_range", er, vbg2, extr[0], n=5)
