"""Odometry cost split on TPU. CHAINED timing: the axon tunnel coalesces
repeated identical-input programs (reads ~0 ms), so every timed call feeds
its output back as the next call's input."""
import time

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


def chain_time(name, f, x0, n=10):
    """f: x -> x (same pytree shape). Chained => really sequential."""
    x = jax.block_until_ready(f(x0))
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
    return x


d0, d1 = depths[0], depths[1]
c0, c1 = colors[0], colors[1]

# full odometry: chain via an epsilon depth perturbation derived from the
# result (keeps inputs fresh without changing the problem)
def mk_full(method):
    @jax.jit
    def f(d):
        T = odom.rgbd_odometry_multi_scale(
            RGBDImage(color=c0, depth=d), RGBDImage(color=c1, depth=d1),
            intr, method=method,
        ).transformation
        return d + T[0, 0] * 0.0  # data dependency, numerically d
    return f

chain_time("odometry pt2plane full", mk_full(odom.POINT_TO_PLANE), d0)
chain_time("odometry hybrid full", mk_full(odom.HYBRID), d0)


@jax.jit
def pyr_f(d):
    p = im.build_depth_pyramid(d, 3)
    return d + p[2][0, 0] * 0.0

chain_time("depth pyramid(3)", pyr_f, d0)


@jax.jit
def bil_f(d):
    return d + im.filter_bilateral_depth(d)[0, 0] * 0.0

chain_time("bilateral 640x480", bil_f, d0)

vtx = jax.jit(lambda d: im.create_vertex_map(d, intr))(d1)
nrm = jax.jit(im.create_normal_map)(vtx)
jax.block_until_ready((vtx, nrm))


@jax.jit
def gn_f(d):
    v = im.create_vertex_map(d, intr)
    T = odom._gn_level(
        odom._LevelData(v, None, vtx, nrm, None, intr),
        jnp.eye(4, dtype=jnp.float32), odom.POINT_TO_PLANE,
        odom.OdometryConvergenceCriteria(3), odom.OdometryLossParams(),
    )
    return d + T[0, 0] * 0.0

chain_time("vertexmap + GN level0 (3 iters, 640x480)", gn_f, d0)


@jax.jit
def rows_f(d):
    v = im.create_vertex_map(d, intr)
    _, r, w, valid, _ = odom._rows_point_to_plane(
        odom._LevelData(v, None, vtx, nrm, None, intr),
        jnp.eye(4, dtype=jnp.float32), odom.OdometryLossParams(),
    )
    return d + jnp.sum(r * w) * 0.0

chain_time("vertexmap + rows pt2plane (1 eval)", rows_f, d0)
