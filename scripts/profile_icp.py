"""Per-stage ICP breakdown on the bench workload (VERDICT r4 item 5).

Stages timed separately at the bench config (voxel 0.02 downsample to
capacity 40960, dmax 0.05): correspondence sweep (1-NN), target gather +
estimation (JtJ assembly + 6x6 solve), full fused iteration.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/o3dtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from open3d_tpu.core import lie, nns
from open3d_tpu.data import synthetic
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.geometry.rgbd import pointcloud_from_depth
from open3d_tpu.ops import pointcloud as pc_ops
from open3d_tpu.pipelines import registration as reg


def drain(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


def timeit(f, args, reps=20):
    out = f(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    drain(out)
    return (time.perf_counter() - t0) / reps


intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
depths, _, extr, _ = synthetic.render_sequence(2, intrinsic=intr, span=0.15)
clouds = []
for i in range(2):
    pcd = pointcloud_from_depth(depths[i], intr, extr[i])
    down = pc_ops.voxel_down_sample(pcd, 0.02, capacity=40960)
    clouds.append(pc_ops.estimate_normals(down, max_nn=30))
src, tgt = clouds
print("valid src:", int(jnp.sum(src.mask)), "valid tgt:", int(jnp.sum(tgt.mask)))

est = reg.TransformationEstimationPointToPlane()

# stage 1: 1-NN sweep alone
nn = jax.jit(lambda p: nns.one_nn_search(p, tgt.positions, target_mask=tgt.mask))
t_nn = timeit(nn, (src.positions,))
print(f"1-NN sweep          : {t_nn*1e3:8.3f} ms")

# stage 2: gather + estimation given correspondences
idx0, d20 = nn(src.positions)
valid0 = src.mask & (idx0 >= 0) & (d20 <= 0.05 * 0.05)


def est_only(pos, idx, valid):
    return est.compute(pos, src.attrs, tgt, idx, valid, None)


t_est = timeit(jax.jit(est_only), (src.positions, idx0, valid0))
print(f"gather + estimation : {t_est*1e3:8.3f} ms")

# stage 3: transform alone
t_tr = timeit(
    jax.jit(lambda T, p: lie.transform_points(T, p)), (jnp.eye(4), src.positions)
)
print(f"transform           : {t_tr*1e3:8.3f} ms")

# full iteration (10 iters fixed)
f = jax.jit(
    lambda s, t: reg.icp(
        s, t, 0.05, estimation=est,
        criteria=reg.ICPConvergenceCriteria(
            max_iteration=10, relative_fitness=0.0, relative_rmse=0.0
        ),
    ).transformation
)
t_full = timeit(f, (src, tgt), reps=3)
print(f"full 10-iter ICP    : {t_full*1e3:8.3f} ms  ({10/t_full:.1f} iters/s)")
