"""Odometry cost split on TPU: pyramids vs per-level GN vs gathers."""
import time
from functools import partial

import jax
import jax.numpy as jnp

from open3d_tpu.data import synthetic
from open3d_tpu.geometry import image as im
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.geometry.rgbd import RGBDImage
from open3d_tpu.pipelines import odometry as odom

intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
depths, colors, extr, _ = synthetic.render_sequence(2, intrinsic=intr, span=0.05)
jax.block_until_ready(depths)
src = RGBDImage(color=colors[0], depth=depths[0])
tgt = RGBDImage(color=colors[1], depth=depths[1])


def timeit(name, f, *a, n=10):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    return out


full = jax.jit(lambda s, t: odom.rgbd_odometry_multi_scale(
    s, t, intr, method=odom.POINT_TO_PLANE).transformation)
timeit("odometry pt2plane full", full, src, tgt)

hyb = jax.jit(lambda s, t: odom.rgbd_odometry_multi_scale(
    s, t, intr, method=odom.HYBRID).transformation)
timeit("odometry hybrid full", hyb, src, tgt)

timeit("depth pyramid", jax.jit(lambda d: im.build_depth_pyramid(d, 3)), depths[0])
timeit("bilateral", jax.jit(im.filter_bilateral_depth), depths[0])
vtx = jax.jit(lambda d: im.create_vertex_map(d, intr))(depths[0])
timeit("vertex map", jax.jit(lambda d: im.create_vertex_map(d, intr)), depths[0])
timeit("normal map", jax.jit(im.create_normal_map), vtx)

# one full-res GN level alone (3 iters)
nrm = jax.jit(im.create_normal_map)(vtx)
ld = odom._LevelData(vtx, None, vtx, nrm, None, intr)
g1 = jax.jit(lambda v, n: odom._gn_level(
    odom._LevelData(v, None, v, n, None, intr),
    jnp.eye(4, dtype=jnp.float32), odom.POINT_TO_PLANE,
    odom.OdometryConvergenceCriteria(3), odom.OdometryLossParams()))
timeit("GN level0 (3 iters, 640x480)", g1, vtx, nrm)

# a single row evaluation (1 gather set)
rows1 = jax.jit(lambda v, n: odom._rows_point_to_plane(
    odom._LevelData(v, None, v, n, None, intr),
    jnp.eye(4, dtype=jnp.float32), odom.OdometryLossParams())[1])
timeit("rows pt2plane (1 eval)", rows1, vtx, nrm)
