"""Per-stage profile of the TSDF integrate path (touch / activate / sample /
fuse / raycast) on the current backend."""
import time
from functools import partial

import jax
import jax.numpy as jnp

from open3d_tpu.data import synthetic
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.core import hashmap as hm
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic

intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
depths, colors, extr, _ = synthetic.render_sequence(4, intrinsic=intr, span=0.2)
depths = jax.block_until_ready(depths)
vbg = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16, block_count=40960, with_color=True)
FBC = 1024

touch = jax.jit(
    lambda vbg, d, e: vbg_mod.compute_unique_block_coordinates(
        vbg, d, intr, e, depth_max=3.0, frame_block_capacity=FBC
    )
)
act = jax.jit(lambda table, keys: hm.activate(table, keys))
integ = partial(jax.jit, donate_argnums=(0,))(
    lambda vbg, keys, d, c, e: vbg_mod.integrate(vbg, keys, d, c, intr, e, depth_max=3.0)
)
ray = jax.jit(lambda vbg, e: vbg_mod.raycast(vbg, intr, e))


def timeit(name, f, *a, n=5):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*a))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms")
    return out


keys, cnt = timeit("touch", touch, vbg, depths[0], extr[0])
print("touched blocks:", int(cnt))
table, slot, ok = timeit("activate", act, vbg.table, keys)

# integrate with donation: rebuild each call to keep buffers live
out = jax.block_until_ready(integ(vbg, keys, depths[0], colors[0], extr[0]))
t0 = time.perf_counter()
n = 10
for _ in range(n):
    out = integ(out, keys, depths[0], colors[0], extr[0])
jax.block_until_ready(out)
print(f"integrate (donated): {(time.perf_counter()-t0)/n*1000:.2f} ms")
print("active blocks:", int(out.num_active_blocks()))

timeit("raycast", ray, out, extr[0], n=3)
