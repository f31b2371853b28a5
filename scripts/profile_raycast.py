"""Raycast perf on TPU: full pipeline + stage bisect."""
import time
import jax, jax.numpy as jnp
from open3d_tpu.data import synthetic
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from functools import partial


def timeit(name, f, *a, n=5):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*a))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    return out


intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
depths, colors, extr, _ = synthetic.render_sequence(8, intrinsic=intr, span=0.4)
vbg = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16, block_count=40960)

@partial(jax.jit, donate_argnums=(0,))
def step(vbg, d, c, E):
    keys, _ = vbg_mod.compute_unique_block_coordinates(vbg, d, intr, E, depth_max=3.0, frame_block_capacity=1024)
    return vbg_mod.integrate(vbg, keys, d, c, intr, E, depth_max=3.0)

for i in range(8):
    vbg = step(vbg, depths[i], colors[i], extr[i])
jax.block_until_ready(vbg)
print("active:", int(vbg.num_active_blocks()), flush=True)

E = extr[0]
er = jax.jit(lambda v, E: vbg_mod.estimate_range(v, intr, E, 0.1, 3.0))
timeit("estimate_range", er, vbg, E)
bi = jax.jit(lambda v, E: vbg_mod.build_block_index(v, E[:3, 3] * 0.0, 66))
timeit("build_block_index", bi, vbg, E)
full = jax.jit(lambda v, E: vbg_mod.raycast(v, intr, E, depth_min=0.1, depth_max=3.0))
timeit("raycast full", full, vbg, E)
