"""Validate + time the new Pallas raycast vs the round-2 XLA raycast."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from open3d_tpu.data import synthetic
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.ops.pallas import raycast as prc


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(name, f, *a, n=10):
    out = f(*a)
    _ = sync(out)
    t0 = time.perf_counter()
    for _i in range(n):
        out = f(*a)
    _ = sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    return out


intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
depths, colors, extrs, _ = synthetic.render_sequence(8, intrinsic=intr, span=0.4)
_ = sync(depths)
vbg = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16, block_count=40960)


@partial(jax.jit, donate_argnums=(0,))
def step(vbg, d, c, E):
    keys, _ = vbg_mod.compute_unique_block_coordinates(
        vbg, d, intr, E, depth_max=3.0, frame_block_capacity=1024
    )
    return vbg_mod.integrate(vbg, keys, d, c, intr, E, depth_max=3.0)


for i in range(8):
    vbg = step(vbg, depths[i], colors[i], extrs[i])
_ = sync(vbg.tw)
print("active blocks:", int(vbg.num_active_blocks()), flush=True)

E = extrs[0]

# new fast path
fast = jax.jit(
    lambda v, E: prc.raycast_depth(v, intr, E, depth_min=0.1, depth_max=3.0)
)
d_fast, ovf = timeit("raycast_fast", fast, vbg, E)
print("overflow:", int(ovf), flush=True)

lists_f = jax.jit(
    lambda v, E: prc.build_tile_lists(v, intr, E, 0.1, 3.0, K=24)
)
lists = timeit("  pass1 build_tile_lists", lists_f, vbg, E)
print("  nk mean/max:", float(jnp.mean(lists.nk)), int(jnp.max(lists.nk)),
      "extras:", int(lists.n_extra[0]), flush=True)
march_f = jax.jit(
    lambda v, l, E: prc.march_tiles(v, l, intr, E, 0.1, 3.0, K=24)
)
timeit("  pass2 march", march_f, vbg, lists, E)

# reference XLA path
old = jax.jit(lambda v, E: vbg_mod.raycast(v, intr, E, depth_min=0.1, depth_max=3.0))
res_old = timeit("raycast_old (XLA)", old, vbg, E, n=2)

# compare against the true synthetic depth
d_true = np.asarray(depths[0])
dn_fast = np.asarray(d_fast)
dn_old = np.asarray(res_old.depth)
for name, dn in [("fast", dn_fast), ("old", dn_old)]:
    both = (dn > 0) & (d_true > 0)
    err = np.abs(dn - d_true)[both]
    print(
        f"{name}: hit {np.mean(dn > 0):.3f} true {np.mean(d_true > 0):.3f} "
        f"| mean err {err.mean()*1000:.2f} mm p95 {np.percentile(err, 95)*1000:.2f} mm "
        f"| miss-where-true {np.mean((dn == 0) & (d_true > 0)):.4f}",
        flush=True,
    )
