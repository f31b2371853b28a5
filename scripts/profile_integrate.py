import time, jax, jax.numpy as jnp
from open3d_tpu.data import synthetic
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.core import hashmap as hm
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic

intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
depths, colors, extr, _ = synthetic.render_sequence(4, intrinsic=intr, span=0.2)
depths = jax.block_until_ready(depths)
vbg = vbg_mod.create(voxel_size=3.0/512, block_resolution=16, block_count=40960, with_color=True)

touch = jax.jit(lambda vbg, d, e: vbg_mod.compute_unique_block_coordinates(vbg, d, intr, e, depth_max=3.0, frame_block_capacity=8192))
act = jax.jit(lambda table, keys: hm.activate(table, keys))
integ = jax.jit(lambda vbg, keys, d, c, e: vbg_mod.integrate(vbg, keys, d, c, intr, e, depth_max=3.0))

def timeit(name, f, *a, n=5):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*a))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms")
    return out

keys, cnt = timeit("touch", touch, vbg, depths[0], extr[0])
print("touched blocks:", int(cnt))
table, slot, ok = timeit("activate", act, vbg.table, keys)
vbg2 = timeit("integrate", integ, vbg, keys, depths[0], colors[0], extr[0])
