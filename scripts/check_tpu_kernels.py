"""On-TPU validation + timing of the round-3 Pallas kernels.

Run when the TPU is reachable:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_tpu_kernels.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from open3d_tpu.core.platform import is_tpu
from open3d_tpu.data import synthetic
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.models import dense_slam


def drain(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    return float(jnp.sum(leaves[0].reshape(-1)[:4].astype(jnp.float32)))


def timeit(name, f, *a, n=10):
    out = f(*a)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    drain(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms ({1/dt:.1f}/s)", flush=True)
    return out


print("backend:", jax.default_backend(), "is_tpu:", is_tpu(), flush=True)

intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
depths, colors, extr, _ = synthetic.render_sequence(8, intrinsic=intr, span=0.4)
drain(depths)

vbg = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16, block_count=40960)


@partial(jax.jit, donate_argnums=(0,))
def step(vbg, d, c, E):
    keys, _ = vbg_mod.compute_unique_block_coordinates(
        vbg, d, intr, E, depth_max=3.0, frame_block_capacity=2048
    )
    return vbg_mod.integrate(vbg, keys, d, c, intr, E, depth_max=3.0)


# correctness vs the XLA path
va = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16, block_count=40960)
vb = vbg_mod.create(voxel_size=3.0 / 512, block_resolution=16, block_count=40960)


def one(v, i, up):
    keys, _ = vbg_mod.compute_unique_block_coordinates(
        v, depths[i], intr, extr[i], depth_max=3.0, frame_block_capacity=2048
    )
    return vbg_mod.integrate(
        v, keys, depths[i], colors[i], intr, extr[i], depth_max=3.0, use_pallas=up
    )


for i in range(2):
    va = one(va, i, False)
    vb = one(vb, i, True)
ta, wa = va.tsdf_weight()
tb, wb = vb.tsdf_weight()
wd = float(jnp.mean((wa != wb).astype(jnp.float32)))
same = np.asarray(wa == wb)
terr = float(jnp.max(jnp.abs(jnp.asarray(ta)[same] - jnp.asarray(tb)[same])))
print(f"integrate parity: weight-mismatch {wd:.2e}, tsdf err {terr:.2e}", flush=True)

# timing
for i in range(8):
    vbg = step(vbg, depths[i], colors[i], extr[i])
drain(vbg.tw)
t0 = time.perf_counter()
for rep in range(3):
    for i in range(8):
        vbg = step(vbg, depths[i], colors[i], extr[i])
drain(vbg.tw)
dt = (time.perf_counter() - t0) / 24
print(f"integrate+touch: {dt*1000:.2f} ms = {1/dt:.1f} fps", flush=True)

# raycast parity + speed
from open3d_tpu.ops.pallas import raycast as prc

fast = jax.jit(lambda v, E: prc.raycast_depth(v, intr, E, 0.1, 3.0)[0])
d_fast = timeit("raycast_fast", fast, vbg, extr[0])
old = jax.jit(
    lambda v, E: vbg_mod.raycast(v, intr, E, 0.1, 3.0, use_pallas=False).depth
)
d_old = timeit("raycast_old(XLA)", old, vbg, extr[0], n=2)
dn, do, dt_ = np.asarray(d_fast), np.asarray(d_old), np.asarray(depths[0])
# compare only within integration range (true depths beyond depth_max were
# never integrated — counting them as misses is a harness artifact)
in_range = (dt_ > 0) & (dt_ < 2.9)
both = (dn > 0) & in_range
err = np.abs(dn - dt_)[both]
print(
    f"raycast parity: hit {np.mean(dn>0):.3f}, "
    f"median err {np.median(err)*1000:.2f} mm, "
    f"miss-in-range {np.mean((dn==0)&in_range):.4f}",
    flush=True,
)

# SLAM loop
cfg = dense_slam.SLAMConfig(block_count=40960, frame_block_capacity=2048)
model = dense_slam.create_model(cfg)


@partial(jax.jit, donate_argnums=(0,))
def sstep(model, depth, color, md):
    return dense_slam.slam_step(model, depth, color, md, intr)


md = jnp.zeros_like(depths[0])
res = sstep(model, depths[0], colors[0], md)
model, md = res.model, res.raycast_depth
drain(md)
t0 = time.perf_counter()
for rep in range(2):
    for i in range(8):
        res = sstep(model, depths[i], colors[i], md)
        model, md = res.model, res.raycast_depth
drain(md)
dt = (time.perf_counter() - t0) / 16
print(f"slam_step: {dt*1000:.2f} ms = {1/dt:.1f} fps", flush=True)
